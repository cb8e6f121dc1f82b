package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec

/** Budget enforcement — the reference's 300 s `TimeoutSeconds`
  * (StateMachine.txt:31,68) made a RUNTIME behavior: over-budget work
  * is killed promptly and leaves a terminal FAILED record. */
class WatchdogSpec extends SparkSpec {
  import spark.implicits._

  /** A Spark job that would run ~forever without cancellation: many
    * waves of sleeping tasks. Interruptible (Thread.sleep) so the job
    * group's interruptOnCancel kills it fast. */
  private def slowJob(): Unit = {
    spark.sparkContext.parallelize(1 to 64, 64)
      .mapPartitions { it => Thread.sleep(30000); it }
      .count()
    ()
  }

  test("runWithBudget kills an over-budget batch run promptly and records FAILED") {
    val statusDir = Files.createTempDirectory("graft-watchdog").toString
    val t0 = System.currentTimeMillis()
    val e = intercept[Watchdog.BudgetExceededException] {
      Watchdog.runWithBudget(spark, statusDir, "over-budget-run", 500L) {
        slowJob()
      }
    }
    val elapsed = System.currentTimeMillis() - t0
    assert(e.runId == "over-budget-run" && e.budgetMillis == 500L)
    // 64 tasks × 30 s over 32 cores ≈ 60 s uncancelled; the kill must
    // land orders of magnitude sooner
    assert(elapsed < 15000, s"cancellation took ${elapsed} ms")
    val st = Streaming.readStatuses(statusDir)
    assert(st.exists(m => m.get("run_id").contains("over-budget-run") &&
      m.get("status").contains("FAILED") &&
      m.get("exception").exists(_.contains("budget"))))
  }

  test("runWithBudget returns the body's result and records SUCCEEDED inside budget") {
    val statusDir = Files.createTempDirectory("graft-watchdog").toString
    val n = Watchdog.runWithBudget(spark, statusDir, "ok-run", 120000L) {
      spark.range(100).count()
    }
    assert(n == 100L)
    val st = Streaming.readStatuses(statusDir)
    assert(st.exists(m => m.get("run_id").contains("ok-run") &&
      m.get("status").contains("SUCCEEDED")))
    // a later run under the same id overwrites with its own terminal state
    intercept[RuntimeException] {
      Watchdog.runWithBudget(spark, statusDir, "ok-run", 120000L) {
        throw new RuntimeException("boom")
      }
    }
    assert(Streaming.readStatuses(statusDir).exists(m =>
      m.get("run_id").contains("ok-run") && m.get("status").contains("FAILED") &&
        m.get("exception").exists(_.contains("boom"))))
  }

  test("enforceBudget fails an over-budget streaming query; listener records terminal FAILED") {
    implicit val sqlCtx = spark.sqlContext
    val statusDir = Files.createTempDirectory("graft-stream-watchdog").toString
    val listener = Streaming.withStatusListener(spark, statusDir)
    try {
      val mem = MemoryStream[Int]
      val q = mem.toDF().writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // a slow SPARK JOB inside the batch (runs in the stream's job
          // group) — the watchdog's cancel must be able to reach it
          b.sparkSession.sparkContext.parallelize(1 to 64, 64)
            .mapPartitions { it => Thread.sleep(30000); it }
            .count()
          ()
        }
        .start()
      val wd = Streaming.enforceBudget(spark, q, 500L, statusDir)
      mem.addData(1)
      val t0 = System.currentTimeMillis()
      val failed =
        try { q.awaitTermination(60000); false }
        catch { case _: StreamingQueryException => true }
      assert(failed, "over-budget query must terminate with an exception")
      assert(System.currentTimeMillis() - t0 < 30000)
      wd.interrupt()
      // listener events are async; poll briefly for the terminal record
      val deadline = System.currentTimeMillis() + 10000
      def recorded() = Streaming.readStatuses(statusDir).exists(m =>
        m.get("run_id").contains(q.runId.toString) &&
          m.get("status").contains("FAILED"))
      while (!recorded() && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(recorded(), "terminal FAILED record must be durable")
    } finally spark.streams.removeListener(listener)
  }
}
