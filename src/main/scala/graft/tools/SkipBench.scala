package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.ops.Manifest
import graft.plans.ManifestScan

/** Prices planner-integrated data skipping: a month-ranged aggregate
  * over a year-banded manifest orders table, read three ways —
  *
  *  (a) `full`: [[Manifest.read]] + WHERE (no file skipping — every
  *      band is opened, the filter runs inside the scan);
  *  (b) `scan`: [[ManifestScan.scan]] + the SAME WHERE — the FileIndex
  *      prunes to the bands whose min/max can match;
  *  (c) `clustered`: after [[Manifest.cluster]] on the date column —
  *      per-file ranges are disjoint, so the prune tightens from
  *      band granularity to ~selectivity × files.
  *
  * Reports seconds (min across passes) AND files opened (the
  * FileSourceScanExec numFiles metric) — the second number is the one
  * that scales: at 100 TB the full read opens ~8×10⁵ files, the
  * clustered scan opens `selectivity` of them. */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session(appName = "graft-skip-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def filesScanned(df: DataFrame): Long = {
      df.collect() // metrics must come from THIS QueryExecution (a
                   // noop write would plan and execute a fresh one)
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] =
        p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec => scans(q.plan)
          case f: FileSourceScanExec => Seq(f.metrics("numFiles").value)
          case other => other.children.flatMap(scans)
        }
      scans(df.queryExecution.executedPlan).sum
    }

    var fullMin, scanMin, clusMin = Double.MaxValue
    var fullFiles, scanFiles, clusFiles, totFiles = 0L
    (1 to passes).foreach { pass =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-skipbench-$pass").toString
      val dir = s"$root/orders"
      val orders = graft.io.Sources.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          col("o_orderstatus"))
      // year-banded appends: the time-ordered daily feed, one band/year
      val years = orders.select(year(col("o_orderdate")).as("y"))
        .distinct().collect().map(_.getInt(0)).sorted
      Manifest.create(spark, dir,
        orders.filter(year(col("o_orderdate")) === years.head),
        "o_orderstatus", statsCols = Seq("o_orderdate"))
      years.tail.foreach(y => Manifest.append(spark, dir,
        orders.filter(year(col("o_orderdate")) === y), "o_orderstatus"))
      totFiles = Manifest.loadSnapshot(spark, dir).entries.size

      def monthAgg(df: DataFrame): DataFrame = df
        .filter(col("o_orderdate").between("1995-03-01", "1995-03-31"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("s"),
          count(lit(1)).as("n"))

      val fullDf = monthAgg(Manifest.read(spark, dir))
      val f = time { fullFiles = filesScanned(fullDf) }
      val scanDf = monthAgg(ManifestScan.scan(spark, dir, Some("o_orderstatus")))
      val s = time { scanFiles = filesScanned(scanDf) }
      val total = Manifest.loadSnapshot(spark, dir).entries.map(_.bytes).sum
      Manifest.cluster(spark, dir, "o_orderstatus", "o_orderdate",
        targetBytes = math.max(1L, total / totFiles))
      val clusDf = monthAgg(ManifestScan.scan(spark, dir, Some("o_orderstatus")))
      val c = time { clusFiles = filesScanned(clusDf) }

      fullMin = math.min(fullMin, f); scanMin = math.min(scanMin, s)
      clusMin = math.min(clusMin, c)
      System.err.println(f"[skip-bench] pass $pass full=$f%.2fs/$fullFiles scan=$s%.2fs/$scanFiles clustered=$c%.2fs/$clusFiles of $totFiles files")
    }
    println(f"""{"metric":"data_skipping","full_s":$fullMin%.3f,"full_files":$fullFiles,"scan_s":$scanMin%.3f,"scan_files":$scanFiles,"clustered_s":$clusMin%.3f,"clustered_files":$clusFiles,"total_files":$totFiles,"passes":$passes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
