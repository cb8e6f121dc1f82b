package graft.plans

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Manifest

/** Planner-integrated data skipping: a plain `.filter` over
  * [[ManifestScan.scan]] must open only the files whose manifest stats
  * can match — no explicit readRange/readPoint call. */
class ManifestScanSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-manscan").toString + "/tbl"

  /** 3 date-banded appends (one per year 1994-96) of 300 rows each —
    * the time-ordered daily feed. Tiny data = AQE coalesces each band
    * to ONE file, so the table is exactly 3 files, one per year. */
  private def mkDateBanded(dir: String): Unit = {
    def band(year: Int): DataFrame =
      spark.range(1, 301).select(
        $"id".as("k"),
        lit(Date.valueOf(s"$year-06-15")).as("d"),
        ($"id" % 4).as("p"),
        ($"id" * 1.0).as("v"))
    Manifest.create(spark, dir, band(1994), "p", statsCols = Seq("d"))
    Manifest.append(spark, dir, band(1995), "p")
    Manifest.append(spark, dir, band(1996), "p")
  }

  /** 4 single-partition-value appends: file i holds only p = i. */
  private def mkPartitioned(dir: String): Unit = {
    def part(p: Int): DataFrame =
      spark.range(1, 101).select($"id".as("k"), lit(p.toLong).as("p"),
        ($"id" * 1.0).as("v"))
    Manifest.create(spark, dir, part(0), "p")
    (1 to 3).foreach(p => Manifest.append(spark, dir, part(p), "p"))
  }

  /** Executes `df` and sums the parquet scan's `numFiles` metric
    * (descending through the AQE wrapper). */
  private def filesScanned(df: DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case f: FileSourceScanExec => Seq(f.metrics("numFiles").value)
        case other => other.children.flatMap(scans)
      }
    scans(df.queryExecution.executedPlan).sum
  }

  test("date-range WHERE prunes to the matching band, result parity with full read") {
    val dir = newDir()
    mkDateBanded(dir)
    val all = filesScanned(ManifestScan.scan(spark, dir))
    assert(all == 3, s"expected 3 band files, got $all")

    val pruned = ManifestScan.scan(spark, dir)
      .filter($"d" >= "1995-01-01" && $"d" <= "1995-12-31")
    assert(filesScanned(pruned) == 1,
      s"range read opened ${filesScanned(pruned)} of $all files")
    assert(pruned.count() == 300)

    // parity with the non-pruned path on the same predicate
    val viaRead = Manifest.read(spark, dir)
      .filter($"d" >= "1995-01-01" && $"d" <= "1995-12-31")
      .select("k", "d", "p", "v").collect().toSet
    assert(pruned.select("k", "d", "p", "v").collect().toSet == viaRead)
  }

  test("partition-value equality prunes to one file; IN prunes to the union") {
    val dir = newDir()
    mkPartitioned(dir)
    val all = filesScanned(ManifestScan.scan(spark, dir, Some("p")))
    assert(all == 4, s"expected 4 files, got $all")
    assert(filesScanned(
      ManifestScan.scan(spark, dir, Some("p")).filter($"p" === 1)) == 1)
    assert(filesScanned(
      ManifestScan.scan(spark, dir, Some("p")).filter($"p".isin(1, 2))) == 2)
    // range on the partition column prunes via the exact value set too
    assert(filesScanned(
      ManifestScan.scan(spark, dir, Some("p")).filter($"p" >= 2)) == 2)
    assert(ManifestScan.scan(spark, dir, Some("p"))
      .filter($"p" === 1).count() == 100)
  }

  test("unsupported predicate fails open: all files, correct answer") {
    val dir = newDir()
    mkDateBanded(dir)
    val df = ManifestScan.scan(spark, dir).filter($"k" % 7 === 1)
    assert(filesScanned(df) == 3)
    assert(df.count() === 3 * spark.range(1, 301)
      .filter($"id" % 7 === 1).count())
  }

  test("IsNotNull guard prunes a file whose stat column is all null") {
    val dir = newDir()
    val withD = spark.range(1, 101).select($"id".as("k"),
      lit(Date.valueOf("1994-06-15")).as("d"), lit(0L).as("p"))
    val nullD = spark.range(101, 201).select($"id".as("k"),
      lit(null).cast("date").as("d"), lit(0L).as("p"))
    Manifest.create(spark, dir, withD, "p", statsCols = Seq("d"))
    Manifest.append(spark, dir, nullD, "p")
    val all = filesScanned(ManifestScan.scan(spark, dir))
    // d >= X implies IsNotNull(d): the all-null file must be skipped
    val n = filesScanned(
      ManifestScan.scan(spark, dir).filter($"d" >= "1990-01-01"))
    assert(n < all, s"all-null file not skipped: $n of $all")
    // and IsNull must still find those rows (no pruning on stats)
    assert(ManifestScan.scan(spark, dir).filter($"d".isNull).count() == 100)
  }

  test("fact-side predicate prunes inside a broadcast-join query") {
    val dir = newDir()
    mkPartitioned(dir)
    val dim = Seq((2L, "two")).toDF("p", "name")
    val q = ManifestScan.scan(spark, dir, Some("p")).filter($"p" === 2)
      .join(broadcast(dim), "p")
    assert(filesScanned(q) == 1)
    assert(q.count() == 100)
  }

  test("parquet-level pushdown still active below the index (PushedFilters)") {
    val dir = newDir()
    mkDateBanded(dir)
    val df = ManifestScan.scan(spark, dir).filter($"k" === 17)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(k,17"),
      s"no parquet pushdown in:\n$plan")
  }

  test("cluster makes per-file ranges disjoint: ranged read goes from all files to one") {
    val dir = newDir()
    // 3 batches, each INTERLEAVING all three years: every file spans the
    // full date range, so a year predicate can prune nothing
    def interleaved(seed: Int): DataFrame =
      spark.range(1, 301).select(
        $"id".as("k"),
        when($"id" % 3 === 0, Date.valueOf("1994-06-15"))
          .when($"id" % 3 === 1, Date.valueOf("1995-06-15"))
          .otherwise(Date.valueOf("1996-06-15")).as("d"),
        lit(seed.toLong).as("p"),
        ($"id" * 1.0).as("v"))
    Manifest.create(spark, dir, interleaved(0), "p", statsCols = Seq("d"))
    Manifest.append(spark, dir, interleaved(1), "p")
    Manifest.append(spark, dir, interleaved(2), "p")

    def year95(v: Option[Long] = None) = ManifestScan.scan(spark, dir, version = v)
      .filter($"d" >= "1995-01-01" && $"d" <= "1995-12-31")
    val before = filesScanned(year95())
    assert(before == 3, s"interleaved files must all match, got $before")

    val total = Manifest.loadSnapshot(spark, dir).entries.map(_.bytes).sum
    Manifest.cluster(spark, dir, "p", "d", targetBytes = total / 3 + 1)
    val after = filesScanned(year95())
    assert(after == 1, s"clustered ranged read opened $after files")
    // same relation before and after
    assert(year95().select("k", "d", "p", "v").collect().toSet ==
      year95(Some(3L)).select("k", "d", "p", "v").collect().toSet)
    // clustering a non-stats column is rejected
    intercept[IllegalArgumentException] {
      Manifest.cluster(spark, dir, "p", "v")
    }
  }

  test("SQL over a registered view prunes through the same FileIndex") {
    val dir = newDir()
    mkDateBanded(dir)
    ManifestScan.register(spark, "orders_sql_view", dir)
    val q = spark.sql(
      """SELECT p, count(*) AS n FROM orders_sql_view
        |WHERE d BETWEEN '1995-01-01' AND '1995-12-31'
        |GROUP BY p""".stripMargin)
    assert(filesScanned(q) == 1, "SQL WHERE must reach the FileIndex")
    assert(q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 75L, 1L -> 75L, 2L -> 75L, 3L -> 75L))
  }

  test("clusterZ prunes on BOTH dimensions; single-column cluster only on one") {
    val dir = newDir()
    // full 32×32 grid (x = id%32, y = id div 32 — genuinely 2-D),
    // ingested in 4 residue-interleaved batches so every file spans
    // BOTH full axes and neither axis predicate can prune pre-cluster
    def grid(residue: Int): DataFrame =
      spark.range(0, 1024).filter($"id" % 4 === residue).select(
        $"id".as("k"), ($"id" % 32).as("x"),
        ($"id" / 32).cast("long").as("y"), lit(0L).as("p"))
    Manifest.create(spark, dir, grid(0), "p", statsCols = Seq("x", "y"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, grid(i), "p"))

    def xSlice = ManifestScan.scan(spark, dir).filter($"x" < 8)
    def ySlice = ManifestScan.scan(spark, dir).filter($"y" < 8)
    val all = filesScanned(ManifestScan.scan(spark, dir))
    assert(all == 4 && filesScanned(xSlice) == 4 && filesScanned(ySlice) == 4)

    val total = Manifest.loadSnapshot(spark, dir).entries.map(_.bytes).sum
    Manifest.clusterZ(spark, dir, "p", "x", "y", targetBytes = total / 16 + 1)
    // narrower integral types must work too (zorderKey widens to long);
    // non-integral ones are rejected loudly
    val intDir = newDir()
    Manifest.create(spark, intDir,
      spark.range(0, 64).select($"id".as("k"),
        ($"id" % 8).cast("int").as("x"), ($"id" / 8).cast("int").as("y"),
        ($"id" * 1.5).as("w"), lit(0L).as("p")),
      "p", statsCols = Seq("x", "y", "w"))
    Manifest.clusterZ(spark, intDir, "p", "x", "y", targetBytes = 1L)
    assert(graft.plans.ManifestScan.scan(spark, intDir).count() == 64)
    intercept[IllegalArgumentException] { // double col: type guard fires
      Manifest.clusterZ(spark, intDir, "p", "x", "w")
    }
    val allZ = filesScanned(ManifestScan.scan(spark, dir))
    val xz = filesScanned(xSlice); val yz = filesScanned(ySlice)
    assert(allZ >= 8, s"expected >=8 z-files, got $allZ")
    assert(xz < allZ && yz < allZ,
      s"z-order must prune both axes: x=$xz y=$yz of $allZ")
    // parity: the clustered table is the same relation
    assert(ManifestScan.scan(spark, dir).count() == 1024)
    assert(xSlice.count() == 256 && ySlice.count() == 256)
  }

  test("clusterHilbert prunes on BOTH dimensions; the relation is unchanged") {
    val dir = newDir()
    // same genuinely-2-D grid as the clusterZ case: 4 residue-interleaved
    // batches, so pre-cluster neither axis predicate prunes anything
    def grid(residue: Int): DataFrame =
      spark.range(0, 1024).filter($"id" % 4 === residue).select(
        $"id".as("k"), ($"id" % 32).as("x"),
        ($"id" / 32).cast("long").as("y"), lit(0L).as("p"))
    Manifest.create(spark, dir, grid(0), "p", statsCols = Seq("x", "y"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, grid(i), "p"))
    def xSlice = ManifestScan.scan(spark, dir).filter($"x" < 8)
    def ySlice = ManifestScan.scan(spark, dir).filter($"y" < 8)
    assert(filesScanned(xSlice) == 4 && filesScanned(ySlice) == 4)

    val total = Manifest.loadSnapshot(spark, dir).entries.map(_.bytes).sum
    Manifest.clusterHilbert(spark, dir, "p", "x", "y",
      targetBytes = total / 16 + 1)
    val allH = filesScanned(ManifestScan.scan(spark, dir))
    val xh = filesScanned(xSlice); val yh = filesScanned(ySlice)
    assert(allH >= 8, s"expected >=8 hilbert files, got $allH")
    assert(xh < allH && yh < allH,
      s"hilbert order must prune both axes: x=$xh y=$yh of $allH")
    // parity: clustering must never change the relation
    assert(ManifestScan.scan(spark, dir).count() == 1024)
    assert(xSlice.count() == 256 && ySlice.count() == 256)
  }

  test("clusterZ on a DATE + STRING pair prunes both axes; shared string prefix is skipped") {
    val dir = newDir()
    // 32 dates × 32 string codes, interleaved in 4 batches so neither
    // axis predicate prunes pre-cluster. The string codes share the
    // 8-byte prefix "section/" — longer than the 3-byte Morton window —
    // so this only clusters if the global-common-prefix skip (derived
    // from manifest stats, no data read) moves the window onto the
    // discriminating bytes.
    def grid(residue: Int): DataFrame =
      spark.range(0, 1024).filter($"id" % 4 === residue).select(
        $"id".as("k"),
        date_add(lit(Date.valueOf("1995-01-01")), ($"id" % 32).cast("int"))
          .as("d"),
        concat(lit("section/"),
          lpad(($"id" / 32).cast("long").cast("string"), 2, "0")).as("s"),
        lit(0L).as("p"))
    Manifest.create(spark, dir, grid(0), "p", statsCols = Seq("d", "s"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, grid(i), "p"))

    def dSlice = ManifestScan.scan(spark, dir)
      .filter($"d" < Date.valueOf("1995-01-09"))
    def sSlice = ManifestScan.scan(spark, dir).filter($"s" < "section/08")
    assert(filesScanned(ManifestScan.scan(spark, dir)) == 4 &&
      filesScanned(dSlice) == 4 && filesScanned(sSlice) == 4,
      "pre-cluster: every slice scans everything")

    val total = Manifest.loadSnapshot(spark, dir).entries.map(_.bytes).sum
    Manifest.clusterZ(spark, dir, "p", "d", "s", targetBytes = total / 16 + 1)
    val allZ = filesScanned(ManifestScan.scan(spark, dir))
    val dz = filesScanned(dSlice); val sz = filesScanned(sSlice)
    assert(allZ >= 8, s"expected >=8 z-files, got $allZ")
    assert(dz < allZ && sz < allZ,
      s"date/string z-order must prune both axes: d=$dz s=$sz of $allZ")
    // parity: the clustered table is the same relation
    assert(ManifestScan.scan(spark, dir).count() == 1024)
    assert(dSlice.count() == 256 && sSlice.count() == 256)
  }

  test("clusterZWhere re-clusters ONLY the scoped partition; cold files untouched") {
    val dir = newDir()
    // two partitions, each ingested as 4 interleaved batches over a
    // 16×16 (x, y) grid — no axis predicate prunes pre-cluster
    def grid(p: Long, residue: Int): DataFrame =
      spark.range(0, 256).filter($"id" % 4 === residue).select(
        ($"id" + p * 1000).as("k"), ($"id" % 16).as("x"),
        ($"id" / 16).cast("long").as("y"), lit(p).as("p"))
    Manifest.create(spark, dir, grid(0, 0), "p", statsCols = Seq("x", "y"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, grid(0, i), "p"))
    (0 to 3).foreach(i => Manifest.append(spark, dir, grid(1, i), "p"))

    def hotSlice = ManifestScan.scan(spark, dir, Some("p"))
      .filter($"p" === 0 && $"x" < 4)
    val preHot = filesScanned(hotSlice)
    assert(preHot == 4, s"pre-cluster hot slice must scan all 4, got $preHot")
    def coldEntryPaths = Manifest.loadSnapshot(spark, dir).entries
      .filter(_.values == Seq("1")).map(_.path).toSet
    val coldFiles = coldEntryPaths

    val total = Manifest.loadSnapshot(spark, dir).entries
      .filter(_.values == Seq("0")).map(_.bytes).sum
    val n = Manifest.clusterZWhere(spark, dir, "p", "x", "y",
      values = Seq("0"), targetBytes = total / 8 + 1)
    assert(n == 4, s"exactly the 4 hot-partition files re-cluster, got $n")
    // cold partition: same files byte-for-byte (carried by reference)
    assert(coldEntryPaths == coldFiles,
      "a scoped cluster must not touch the cold partition's files")
    // hot partition: both axes now prune
    val allHot = filesScanned(
      ManifestScan.scan(spark, dir, Some("p")).filter($"p" === 0))
    val hx = filesScanned(hotSlice)
    val hy = filesScanned(ManifestScan.scan(spark, dir, Some("p"))
      .filter($"p" === 0 && $"y" < 4))
    assert(allHot >= 4 && hx < allHot && hy < allHot,
      s"scoped z-order must prune the hot partition: x=$hx y=$hy of $allHot")
    // answer invariant
    assert(ManifestScan.scan(spark, dir).count() == 512)
    assert(hotSlice.count() == 64)
    // refusals: empty scope
    intercept[IllegalArgumentException] {
      Manifest.clusterZWhere(spark, dir, "p", "x", "y", Nil)
    }
  }

  test("clusterIncremental: second pass rewrites ONLY post-watermark files; both axes prune") {
    val dir = newDir()
    def grid(off: Long, residue: Int): DataFrame =
      spark.range(0, 256).filter($"id" % 4 === residue).select(
        ($"id" + off).as("k"), ($"id" % 16).as("x"),
        ($"id" / 16).cast("long").as("y"), lit(0L).as("p"))
    Manifest.create(spark, dir, grid(0, 0), "p", statsCols = Seq("x", "y"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, grid(0, i), "p"))
    val total = Manifest.loadSnapshot(spark, dir).entries.map(_.bytes).sum
    // first pass: no watermark yet → the full curve pass; watermark starts
    val n1 = Manifest.clusterIncremental(spark, dir, "p", "x", "y",
      targetBytes = total / 8 + 1)
    assert(n1 == 4)
    assert(Manifest.pins(spark, dir).contains(Manifest.ClusterWatermarkPin))
    val clustered = Manifest.loadSnapshot(spark, dir).entries
      .map(_.path).toSet
    // a second wave streams in, un-curved
    (0 to 3).foreach(i => Manifest.append(spark, dir, grid(1000, i), "p"))
    val n2 = Manifest.clusterIncremental(spark, dir, "p", "x", "y",
      targetBytes = total / 8 + 1)
    assert(n2 == 4, s"only the 4 post-watermark files rewrite, got $n2")
    val after = Manifest.loadSnapshot(spark, dir).entries.map(_.path).toSet
    assert(clustered.subsetOf(after),
      "the first pass's files must carry by reference untouched")
    // both axes prune across both generations
    val all = filesScanned(ManifestScan.scan(spark, dir))
    val xs = filesScanned(ManifestScan.scan(spark, dir).filter($"x" < 4))
    val ys = filesScanned(ManifestScan.scan(spark, dir).filter($"y" < 4))
    assert(xs < all && ys < all,
      s"incremental clustering must prune both axes: x=$xs y=$ys of $all")
    // answer invariant; an idle pass is a watermark-advancing no-op
    assert(ManifestScan.scan(spark, dir).count() == 512)
    assert(Manifest.clusterIncremental(spark, dir, "p", "x", "y") == 0L)
    // the hilbert flag takes the same path on the superior curve
    val hdir = newDir()
    Manifest.create(spark, hdir, grid(0, 0), "p", statsCols = Seq("x", "y"))
    (1 to 3).foreach(i => Manifest.append(spark, hdir, grid(0, i), "p"))
    assert(Manifest.clusterIncremental(spark, hdir, "p", "x", "y",
      targetBytes = total / 8 + 1, hilbert = true) == 4L)
    assert(ManifestScan.scan(spark, hdir).count() == 256)
  }

  test("clusterZ3 prunes on ALL THREE dimensions") {
    val dir = newDir()
    def grid(residue: Int): DataFrame =
      spark.range(0, 4096).filter($"id" % 4 === residue).select(
        $"id".as("k"), ($"id" % 16).as("x"),
        (($"id" / 16) % 16).cast("long").as("y"),
        ($"id" / 256).cast("long").as("z"), lit(0L).as("p"))
    Manifest.create(spark, dir, grid(0), "p", statsCols = Seq("x", "y", "z"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, grid(i), "p"))
    def slice(c: String) = ManifestScan.scan(spark, dir).filter(col(c) < 4)
    assert(Seq("x", "y", "z").forall(c => filesScanned(slice(c)) == 4),
      "pre-cluster: every axis slice scans everything")
    val total = Manifest.detail(spark, dir)
      .select("size_bytes").as[Long].head()
    Manifest.clusterZ3(spark, dir, "p", "x", "y", "z",
      targetBytes = total / 16 + 1)
    val allZ = filesScanned(ManifestScan.scan(spark, dir))
    assert(allZ >= 8, s"expected >=8 z-files, got $allZ")
    Seq("x", "y", "z").foreach { c =>
      val s = filesScanned(slice(c))
      assert(s < allZ, s"3-D z-order must prune axis $c: $s of $allZ")
    }
    // parity: same relation, exact axis-slice counts
    assert(ManifestScan.scan(spark, dir).count() == 4096)
    assert(Seq("x", "y", "z").forall(c => slice(c).count() == 1024))
    // a non-stats cluster column refuses loudly (shared clusterBy
    // validation; the integral type guard is pinned by the 2-D test
    // and shared verbatim)
    intercept[IllegalArgumentException] {
      Manifest.clusterZ3(spark, dir, "p", "x", "y", "k")
    }
  }

  test("version pin: scan of an old version ignores later commits") {
    val dir = newDir()
    mkDateBanded(dir)
    Manifest.delete(spark, dir,
      spark.range(1, 301).select($"id".as("k"), ($"id" % 4).as("p")),
      Seq("k"), "p")
    assert(ManifestScan.scan(spark, dir).count() == 0)
    assert(ManifestScan.scan(spark, dir, version = Some(3L)).count() == 900)
  }
}
