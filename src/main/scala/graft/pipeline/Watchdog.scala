package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Wall-clock budget enforcement for batch runs — the runtime analog of
  * the reference's per-task `TimeoutSeconds: 300`
  * (`/root/reference/StateMachine.txt:31,68`): Step Functions KILLS an
  * over-budget task and routes the execution to the named Fail state.
  * The engine's prior coverage recorded the budget (BASELINE.md) and
  * had the Fail-state artifact ([[Streaming.StatusFileListener]]) but
  * nothing actually terminated an over-budget run; this closes that
  * gap.
  *
  * Mechanism: the run's jobs are tagged with a job group
  * (`interruptOnCancel = true`), a daemon timer cancels the whole
  * group at the deadline — Spark's native kill point: every in-flight
  * stage's tasks are interrupted, queued jobs in the group die with
  * them — and the terminal FAILED record lands in `statusDir` via the
  * same atomic writer the streaming listener uses, so a monitor polls
  * ONE artifact shape for batch and streaming alike.
  *
  * Granularity: cancellation lands at Spark-job boundaries (plus task
  * interrupt inside a job). Driver-side compute BETWEEN jobs is not
  * interruptible from inside the JVM — that residue is the
  * orchestrator's kill -9, exactly as in the reference where ECS stops
  * the container. Every data-sized unit of work here IS a Spark job,
  * so the uninterruptible residue is planning-time only. */
object Watchdog {

  final case class BudgetExceededException(runId: String, budgetMillis: Long)
    extends RuntimeException(
      s"run $runId exceeded its $budgetMillis ms budget and was cancelled")

  /** Run `body` under `budgetMillis` of wall clock. On success writes a
    * SUCCEEDED record keyed `runId` and returns the result; over
    * budget, cancels the run's job group, writes the FAILED record
    * (with the budget in the exception text), and throws
    * [[BudgetExceededException]]. A failure unrelated to the budget
    * also gets a FAILED record, then rethrows — every outcome leaves a
    * terminal artifact. */
  def runWithBudget[T](spark: SparkSession, statusDir: String, runId: String,
                       budgetMillis: Long)(body: => T): T = {
    val sc = spark.sparkContext
    val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
    val timer = new java.util.Timer(s"graft-watchdog-$runId", true)
    sc.setJobGroup(runId, s"graft run $runId (budget $budgetMillis ms)",
      interruptOnCancel = true)
    timer.schedule(new java.util.TimerTask {
      override def run(): Unit = {
        timedOut.set(true)
        sc.cancelJobGroup(runId)
      }
    }, budgetMillis)
    try {
      val out = body
      Streaming.writeStatusRecord(statusDir, s"$runId.json", Seq(
        "run_id" -> runId, "status" -> "SUCCEEDED", "exception" -> null))
      out
    } catch {
      case e: Throwable =>
        val (status, exc) =
          if (timedOut.get())
            ("FAILED", s"budget of $budgetMillis ms exceeded: ${e.getMessage}")
          else ("FAILED", String.valueOf(e))
        Streaming.writeStatusRecord(statusDir, s"$runId.json", Seq(
          "run_id" -> runId, "status" -> status, "exception" -> exc))
        if (timedOut.get()) throw BudgetExceededException(runId, budgetMillis)
        else throw e
    } finally {
      timer.cancel()
      sc.clearJobGroup()
    }
  }
}
