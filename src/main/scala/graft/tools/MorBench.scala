package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Manifest

/** Prices MERGE-ON-READ deletion vectors against the copy-on-write
  * rewrite they replace, on a month-partitioned orders table:
  *
  *  (a) WRITE: a small keyed delete (~0.3% of one month's rows) as
  *      [[Manifest.delete]] (rewrites every candidate file) vs
  *      [[Manifest.deleteMor]] (writes a position vector, zero data
  *      files);
  *  (b) READ: a full-table aggregate after each — the plain read vs
  *      the masked read (only DV'd files pay the anti-join);
  *  (c) FOLD: [[Manifest.materialize]] — the deferred rewrite, priced
  *      so the "DV now + materialize off-peak" story is a number, not
  *      a claim.
  *
  * Per-op value = MIN across passes (one-sided noise, as Bench.scala).
  * The scale claim under test: CoW delete cost follows the CANDIDATE
  * FILES (resident data), MoR delete cost follows the DELETED ROWS —
  * at 100 TB with bounded file sizes the former grows with the table,
  * the latter doesn't. */
object MorBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val nFiles = if (args.length > 2) args(2) else "32"
    val spark = graft.Spark.session(appName = "graft-mor-bench")
    spark.conf.set("spark.sql.shuffle.partitions", nFiles)
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    var cowDelMin, morDelMin, cowReadMin, morReadMin, matMin = Double.MaxValue
    var cowScatMin, morScatMin = Double.MaxValue
    var baseRows = 0L; var delRows = 0L; var scatRows = 0L
    (1 to passes).foreach { pass =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-morbench-$pass").toString
      val orders = graft.io.Sources.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      // month-LOCALIZED churn: candidate pruning caps the CoW rewrite
      // at one month's files, the favourable case for copy-on-write
      val deletes = orders
        .filter(col("o_month") === "1995-03" && col("o_orderkey") % 347 === 0)
        .select(col("o_orderkey"), col("o_month"))
      // SCATTERED churn (the GDPR / right-to-be-forgotten shape): a few
      // hundred keys spread over every month — every file is a
      // candidate, so CoW rewrites the whole table while MoR still
      // writes kilobytes
      val scattered = orders
        .filter(col("o_orderkey") % 2347 === 0)
        .select(col("o_orderkey"), col("o_month"))

      def agg(dir: String): Unit =
        Manifest.read(spark, dir).groupBy(col("o_month"))
          .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("s"),
            count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()

      val cowDir = s"$root/cow"; val morDir = s"$root/mor"
      Manifest.create(spark, cowDir, orders, "o_month")
      Manifest.create(spark, morDir, orders, "o_month")

      val cd = time { Manifest.delete(spark, cowDir, deletes,
        Seq("o_orderkey"), "o_month") }
      val md = time { Manifest.deleteMor(spark, morDir, deletes,
        Seq("o_orderkey"), "o_month") }
      val cs = time { Manifest.delete(spark, cowDir, scattered,
        Seq("o_orderkey"), "o_month") }
      val ms = time { Manifest.deleteMor(spark, morDir, scattered,
        Seq("o_orderkey"), "o_month") }
      val cr = time { agg(cowDir) }
      val mr = time { agg(morDir) }
      val mm = time { Manifest.materialize(spark, morDir, "o_month") }

      // both roads end at the same relation
      val a = Manifest.read(spark, cowDir)
      val b = Manifest.read(spark, morDir)
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "MoR path diverged from CoW")

      cowDelMin = math.min(cowDelMin, cd); morDelMin = math.min(morDelMin, md)
      cowScatMin = math.min(cowScatMin, cs); morScatMin = math.min(morScatMin, ms)
      cowReadMin = math.min(cowReadMin, cr); morReadMin = math.min(morReadMin, mr)
      matMin = math.min(matMin, mm)
      baseRows = orders.count(); delRows = deletes.count()
      scatRows = scattered.count()
      System.err.println(f"[mor-bench] pass $pass cowDel=$cd%.2fs morDel=$md%.2fs cowScat=$cs%.2fs morScat=$ms%.2fs cowRead=$cr%.2fs morRead=$mr%.2fs mat=$mm%.2fs")
    }
    println(f"""{"metric":"mor_vs_cow","cow_delete_s":$cowDelMin%.3f,"mor_delete_s":$morDelMin%.3f,"cow_scattered_s":$cowScatMin%.3f,"mor_scattered_s":$morScatMin%.3f,"cow_read_s":$cowReadMin%.3f,"mor_read_s":$morReadMin%.3f,"materialize_s":$matMin%.3f,"base_rows":$baseRows,"deleted_rows":$delRows,"scattered_rows":$scatRows,"passes":$passes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
