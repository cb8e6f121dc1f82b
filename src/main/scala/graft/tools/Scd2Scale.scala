package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Spark
import graft.io.Sources
import graft.pipeline.Streaming

/** Prices the streaming SCD2 sink's WRITE AMPLIFICATION at a big SF —
  * the round-10/11 verdicts' "O(live + batch dates) is spec-proven but
  * unpriced" item. The shape a real dimension-history pipeline has:
  *
  *  1. bootstrap a multi-million-row history from the orders table
  *     (sf30: 45 M keys, all live) through the sink's own first batch;
  *  2. fold CDC batches that each revise `pct`% of the keys at a fresh
  *     effective date, through the sink's partition-pruned commit
  *     ([[Streaming.scd2Stream]] → `overwritePartitionsSliced`);
  *  3. after each fold, read the commit's [[graft.ops.Manifest.versionDelta]]
  *     ledger: files/bytes carried BY REFERENCE vs physically written.
  *
  * The claim under test: fold cost and amplification track the LIVE
  * slice plus the batch's closed dates, not the history — so the
  * per-fold numbers stay flat as closed history accumulates, and
  * `writeAmplification` (fraction of the snapshot's bytes the commit
  * wrote) FALLS as the table grows. Prints one JSON line per fold plus
  * a summary. Run with `SPARK_DRIVER_MEM=16g
  * SPARK_GRAFT_SHUFFLE_PARTITIONS=256` at sf30 per BASELINE.md's
  * sizing rule. */
object Scd2Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf30"
    val folds = if (args.length > 1) args(1).toInt else 3
    val pct = if (args.length > 2) args(2).toDouble else 1.0
    val spark = Spark.session(appName = "graft-scd2-scale")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft-scd2-scale")
    val histDir = s"$tmp/hist"
    val ckpt = s"$tmp/ckpt"

    val orders = Sources.table(spark, sfDir, "orders")
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price"))

    // the stream carries (key, tracked price, effective date) — the
    // MemoryStream holds only a DATE CURSOR per batch; each batch's
    // rows are derived from the orders table on the executors, so the
    // driver never materializes the CDC feed
    val mem = MemoryStream[Int]
    val updates = mem.toDF().toDF("day")
      .join(orders.filter(pmod($"k", lit((100 / pct).toLong)) === 0))
      .select($"k", ($"price" * 2).as("price"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")), $"day").as("eff"))
    val q = Streaming.scd2Stream(updates, histDir,
      keys = Seq("k"), tracked = Seq("price"), effectiveCol = "eff", ckpt)

    // batch 0 bootstraps the full history (every key live at day 0);
    // the sink's create path writes it once — not part of the fold cost
    val t0 = System.nanoTime()
    mem.addData(0); q.processAllAvailable()
    val bootSec = (System.nanoTime() - t0) / 1e9
    // replace the cursor-derived bootstrap with the REAL shape: every
    // key live, PLUS a year of already-closed rows spread over 100
    // date partitions — the pile each fold must carry by reference,
    // which is what makes the amplification ledger informative
    val live = orders.select($"k", $"price",
      lit(java.sql.Date.valueOf("2024-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val closedSeed = orders.select($"k", ($"price" * 0.9).as("price"),
      date_add(lit(java.sql.Date.valueOf("2023-01-01")),
        pmod($"k", lit(100)).cast("int")).as("valid_from"))
      .withColumn("valid_to", date_add($"valid_from", 1))
    graft.ops.Manifest.overwrite(spark, histDir,
      live.unionByName(closedSeed), "valid_to")
    val liveRows = graft.ops.Manifest.read(spark, histDir).count()
    System.err.println(
      f"[scd2-scale] bootstrap $liveRows rows, $bootSec%.1f s")

    val results = (1 to folds).map { day =>
      val tf = System.nanoTime()
      mem.addData(day); q.processAllAvailable()
      val sec = (System.nanoTime() - tf) / 1e9
      val v = graft.ops.Manifest.latestVersion(spark, histDir).get
      val d = graft.ops.Manifest.versionDelta(spark, histDir, v - 1, v)
      val total = d.carriedFiles + d.addedFiles
      println(s"""{"metric":"scd2_fold","fold":$day,""" +
        s""""sec":${f"$sec%.1f"},"files_rewritten":${d.addedFiles},""" +
        s""""files_total":$total,"carried_files":${d.carriedFiles},""" +
        s""""carried_bytes":${d.carriedBytes},""" +
        s""""added_bytes":${d.addedBytes},""" +
        s""""write_amplification":${f"${d.writeAmplification}%.3f"}}""")
      (sec, d)
    }
    q.stop()
    val rows = graft.ops.Manifest.read(spark, histDir).count()
    println(s"""{"metric":"scd2_scale","sf_dir":"$sfDir","folds":$folds,""" +
      s""""pct":$pct,"history_rows":$rows,""" +
      s""""fold_secs":[${results.map(r => f"${r._1}%.1f").mkString(",")}],""" +
      s""""amplifications":[${
        results.map(r => f"${r._2.writeAmplification}%.3f").mkString(",")}]}""")
  }
}
