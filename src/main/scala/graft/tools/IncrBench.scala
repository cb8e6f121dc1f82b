package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Incremental, Manifest}

/** Prices incremental view maintenance against the full recompute it
  * replaces: one month-partitioned base table (orders), one
  * month-localized update batch (a slice of one partition's keys), then
  *
  *  (a) `delta`: [[Incremental.refresh]] — change-feed read + bucket-
  *      pruned fold + atomic commit;
  *  (b) `full`:  from-scratch GROUP BY over the whole base +
  *      [[Manifest.overwrite]] of a comparison view — the same output
  *      work a scheduled rebuild pays.
  *
  * Both sides produce a committed manifest view of identical content.
  * Reported per-side value = MIN across passes (same one-sided-noise
  * argument as Bench.scala). The ratio is the scale story: delta cost
  * follows the CHANGED data, full recompute follows the TABLE, so the
  * gap widens linearly with base size at fixed churn. */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    // file-count floor for the base write. The change-feed read costs
    // O(rewritten files), and a rewrite's granularity is one FILE: with
    // fewer files than partition values each file holds several months
    // and one month's churn drags its neighbours through the diff
    // (measured: delta 2.3 s → 6.5 s going sf1 → sf30 at a fixed 32
    // files). Production sizing caps file BYTES (compact targetBytes),
    // which keeps files-per-partition-value ≥ 1 as data grows; the knob
    // stands in for that here.
    val nFiles = if (args.length > 2) args(2) else "32"
    val spark = graft.Spark.session(appName = "graft-incr-bench")
    spark.conf.set("spark.sql.shuffle.partitions", nFiles)
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    var deltaMin = Double.MaxValue
    var fullMin = Double.MaxValue
    var baseRows = 0L
    var deltaKeys = 0L
    (1 to passes).foreach { pass =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-incrbench-$pass").toString
      val baseDir = s"$root/base"
      val viewDir = s"$root/view"
      val fullDir = s"$root/view_full"
      // month-partitioned base with month-localized churn — the time-
      // partitioned lake shape. Partitioning the base by a 3-value
      // status column instead makes ANY update batch touch every file:
      // the upsert rewrites the whole table, the change feed then spans
      // it, and delta refresh degenerates to full-recompute cost plus
      // overhead (measured 3.1 s vs 0.9 s at sf0.1) — churn locality is
      // what the incremental path's economics rest on.
      val orders = graft.io.Sources.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      Manifest.create(spark, baseDir, orders, "o_month")
      Incremental.refresh(spark, baseDir, viewDir,
        Seq("o_custkey"), "o_totalprice")

      def fullView = Manifest.read(spark, baseDir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("decimal(38,2)").as("sum_value"),
          count(lit(1)).as("n_rows"))
        .withColumn("bucket", pmod(xxhash64(col("o_custkey")), lit(32L)))
      // comparison view pre-exists so the timed full path is a plain
      // recompute + overwrite (steady-state rebuild, not a first create)
      Manifest.create(spark, fullDir, fullView, "bucket")

      val updates = orders
        .filter(col("o_month") === "1995-03" && col("o_orderkey") % 17 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Manifest.upsert(spark, baseDir, updates,
        Seq("o_orderkey"), "o_month")

      val d = time {
        Incremental.refresh(spark, baseDir, viewDir,
          Seq("o_custkey"), "o_totalprice")
      }
      val f = time { Manifest.overwrite(spark, fullDir, fullView, "bucket") }
      deltaMin = math.min(deltaMin, d)
      fullMin = math.min(fullMin, f)
      baseRows = orders.count()
      deltaKeys = updates.count()
      // sanity: both views hold the same relation
      val a = Incremental.read(spark, viewDir)
      val b = Manifest.read(spark, fullDir).drop("bucket")
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "delta-refreshed view diverged from the full recompute")
      System.err.println(f"[incr-bench] pass $pass delta=$d%.2fs full=$f%.2fs")
    }
    println(f"""{"metric":"incr_vs_full","delta_refresh_s":$deltaMin%.3f,"full_recompute_s":$fullMin%.3f,"base_rows":$baseRows,"delta_keys":$deltaKeys,"passes":$passes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
