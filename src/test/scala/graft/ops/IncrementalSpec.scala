package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String) =
    Files.createTempDirectory(s"graft-incr-$tag").toString

  /** (row key, group, value, partition) base rows — keys 1..60, ten
    * groups, three partitions. */
  private def rows = spark.range(1, 61)
    .select($"id".as("k"), ($"id" % 10).as("g"), ($"id" * 1.0).as("v"),
      ($"id" % 3).as("p"))

  private def fullRecompute(base: DataFrame): Map[Long, (BigDecimal, Long)] =
    base.groupBy($"g")
      .agg(sum($"v".cast("decimal(12,2)")).cast("decimal(38,2)").as("s"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (BigDecimal(r.getDecimal(1)), r.getLong(2)))
      .toMap

  private def viewState(viewDir: String): Map[Long, (BigDecimal, Long)] =
    Incremental.read(spark, viewDir)
      .collect()
      .map(r => r.getLong(0) -> (BigDecimal(r.getDecimal(1)), r.getLong(2)))
      .toMap

  test("refresh maintains the GROUP BY across upserts, deletes, and appends") {
    val root = newDir("fold")
    val baseDir = s"$root/base"; val viewDir = s"$root/view"
    Manifest.create(spark, baseDir, rows, "p")

    // first refresh = full compute
    val v1 = Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    assert(v1 == 1L && Incremental.refreshedAt(spark, viewDir) == Some(1L))
    assert(viewState(viewDir) ==
      fullRecompute(Manifest.read(spark, baseDir)))

    // mutate the base: revise some values, delete a whole group's rows,
    // append a brand-new group
    val cur = Manifest.read(spark, baseDir)
    Manifest.upsert(spark, baseDir,
      cur.filter($"g" === 1L).withColumn("v", $"v" * 10),
      Seq("k"), "p")
    Manifest.delete(spark, baseDir,
      cur.filter($"g" === 2L).select($"k", $"p"), Seq("k"), "p")
    Manifest.append(spark, baseDir,
      Seq((9999L, 42L, 7.5, 1L)).toDF("k", "g", "v", "p"), "p")

    val v4 = Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    assert(v4 == 4L)
    val expect = fullRecompute(Manifest.read(spark, baseDir))
    assert(viewState(viewDir) == expect)
    // the fully-deleted group left the view; the new group arrived
    assert(!viewState(viewDir).contains(2L))
    assert(viewState(viewDir).contains(42L))

    // an already-current view no-ops (same watermark, same answer)
    val versionsBefore = Manifest.versions(spark, viewDir)
    assert(Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v") == 4L)
    assert(Manifest.versions(spark, viewDir) == versionsBefore)
    assert(viewState(viewDir) == expect)
  }

  test("delta fold touches only the buckets the delta hits, not the whole view") {
    val root = newDir("prune")
    val baseDir = s"$root/base"; val viewDir = s"$root/view"
    // AQE would coalesce this tiny view into ONE shuffle partition —
    // one file holding every bucket, so any delta rewrites everything
    // and the carry-over claim can't be observed. Pin it off so the
    // view spans several files, as any real-sized view does.
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      // many groups so the 32 buckets are well-populated
      val wide = spark.range(1, 2001)
        .select($"id".as("k"), ($"id" % 500).as("g"), lit(1.0).as("v"),
          ($"id" % 3).as("p"))
      Manifest.create(spark, baseDir, wide, "p")
      Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
      val filesBefore = Incremental.read(spark, viewDir)
        .select(input_file_name()).distinct().collect()
        .map(_.getString(0)).toSet
      assert(filesBefore.size > 1, "precondition: view spans several files")

      // one-key revision: exactly one bucket partition is touched
      Manifest.upsert(spark, baseDir,
        Seq((7L, 7L, 99.0, 1L)).toDF("k", "g", "v", "p"), Seq("k"), "p")
      Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
      val filesAfter = Incremental.read(spark, viewDir)
        .select(input_file_name()).distinct().collect()
        .map(_.getString(0)).toSet
      val surviving = filesBefore.intersect(filesAfter)
      assert(surviving.nonEmpty,
        "untouched bucket files must carry over by reference, not rewrite")
      // and the answer still matches the from-scratch GROUP BY
      assert(viewState(viewDir) ==
        fullRecompute(Manifest.read(spark, baseDir)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("the watermark rides the fold commit: a re-run cannot double-count") {
    val root = newDir("idem")
    val baseDir = s"$root/base"; val viewDir = s"$root/view"
    Manifest.create(spark, baseDir,
      Seq((1L, 1L, 10.0, 0L), (2L, 1L, 5.0, 1L)).toDF("k", "g", "v", "p"), "p")
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    Manifest.append(spark, baseDir,
      Seq((3L, 1L, 2.0, 0L)).toDF("k", "g", "v", "p"), "p")

    // two refreshes of the same base version: the second must see the
    // watermark committed by the first and change nothing — the delta
    // is never applied twice
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    val once = viewState(viewDir)
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    assert(viewState(viewDir) == once)
    assert(once(1L) == (BigDecimal("17.00"), 3L))
  }

  test("base vacuumed past the watermark: refresh falls back to a full rebuild") {
    val root = newDir("vac")
    val baseDir = s"$root/base"; val viewDir = s"$root/view"
    Manifest.create(spark, baseDir, rows, "p")
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")

    // advance the base twice, then vacuum away everything older than
    // the newest snapshot — the view's watermark (v1) is now unreadable
    Manifest.append(spark, baseDir,
      Seq((200L, 42L, 7.5, 1L)).toDF("k", "g", "v", "p"), "p")
    Manifest.delete(spark, baseDir,
      Seq((5L, 2L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.vacuumOrphans(spark, baseDir, keepVersions = 1, staleMillis = 0L,
      force = true) // the view's pin would (rightly) refuse this
    intercept[Exception] { Manifest.changes(spark, baseDir, 1L, 3L) }

    val v = Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    assert(v == 3L && Incremental.refreshedAt(spark, viewDir) == Some(3L))
    assert(viewState(viewDir) == fullRecompute(Manifest.read(spark, baseDir)))

    // and incremental refresh resumes from the rebuilt watermark
    Manifest.append(spark, baseDir,
      Seq((201L, 42L, 2.5, 1L)).toDF("k", "g", "v", "p"), "p")
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    assert(viewState(viewDir) == fullRecompute(Manifest.read(spark, baseDir)))
  }

  test("view's own watermark marker vacuumed: refresh rebuilds in place instead of failing create") {
    val root = newDir("vacview")
    val baseDir = s"$root/base"; val viewDir = s"$root/view"
    Manifest.create(spark, baseDir, rows, "p")
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    // two un-marked commits push the marker off, then vacuum drops it
    Manifest.append(spark, viewDir,
      Seq((999L, BigDecimal("0.00"), 0L, 0L)).toDF("g", "sum_value", "n_rows", "bucket")
        .select($"g", $"sum_value".cast("decimal(38,2)"), $"n_rows", $"bucket"),
      "bucket")
    Manifest.delete(spark, viewDir,
      Seq((999L, 0L)).toDF("g", "bucket"), Seq("g"), "bucket")
    Manifest.vacuumOrphans(spark, viewDir, keepVersions = 1, staleMillis = 0L)
    assert(Incremental.refreshedAt(spark, viewDir).isEmpty)

    Manifest.append(spark, baseDir,
      Seq((200L, 42L, 7.5, 1L)).toDF("k", "g", "v", "p"), "p")
    Incremental.refresh(spark, baseDir, viewDir, Seq("g"), "v")
    assert(Incremental.refreshedAt(spark, viewDir) == Some(2L))
    assert(viewState(viewDir) == fullRecompute(Manifest.read(spark, baseDir)))
  }

  // ---- incremental JOIN views ----

  /** A = (k, j, band, p): join key j, band changes under upserts.
    * B = (j, seg, q): dimension side. */
  private def aRows = spark.range(1, 61)
    .select($"id".as("k"), ($"id" % 10).as("j"),
      ($"id" / 20).cast("long").as("band"), ($"id" % 3).as("p"))
  private def bRows = spark.range(0, 10)
    .select($"id".as("j"), concat(lit("s"), $"id" % 4).as("seg"),
      ($"id" % 2).as("q"))

  private def joinRecompute(a: DataFrame, b: DataFrame)
      : Map[(Long, Long, String), Long] =
    a.alias("a").join(b.alias("b"), $"a.j" === $"b.j")
      .groupBy($"a.j", $"a.band", $"b.seg").count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> r.getLong(3))
      .toMap

  private def joinViewState(viewDir: String): Map[(Long, Long, String), Long] =
    Incremental.read(spark, viewDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> r.getLong(3))
      .toMap

  test("refreshJoin maintains the inner-join multiset across changes on BOTH sides") {
    val root = newDir("join")
    val aDir = s"$root/a"; val bDir = s"$root/b"; val viewDir = s"$root/view"
    Manifest.create(spark, aDir, aRows, "p")
    Manifest.create(spark, bDir, bRows, "q")
    def refresh() = Incremental.refreshJoin(spark, aDir, bDir, viewDir,
      "j", "j", Seq("j", "band"), Seq("seg"))
    assert(refresh() == ((1L, 1L)))
    assert(joinViewState(viewDir) ==
      joinRecompute(Manifest.read(spark, aDir), Manifest.read(spark, bDir)))
    // A-side: band moves + deletes + fresh appends
    Manifest.upsert(spark, aDir, spark.range(1, 31)
      .select($"id".as("k"), ($"id" % 10).as("j"),
        lit(9L).as("band"), ($"id" % 3).as("p")), Seq("k"), "p")
    Manifest.delete(spark, aDir, spark.range(1, 61).filter($"id" % 7 === 0)
      .select($"id".as("k"), ($"id" % 3).as("p")), Seq("k"), "p")
    Manifest.append(spark, aDir,
      Seq((100L, 3L, 5L, 1L)).toDF("k", "j", "band", "p"), "p")
    // B-side: segment moves (dimension SCD1)
    Manifest.upsert(spark, bDir, Seq((3L, "moved", 1L), (4L, "moved", 0L))
      .toDF("j", "seg", "q"), Seq("j"), "q")
    refresh()
    assert(joinViewState(viewDir) ==
      joinRecompute(Manifest.read(spark, aDir), Manifest.read(spark, bDir)),
      "two-sided delta fold must equal the from-scratch join")
    assert(Incremental.joinRefreshedAt(spark, viewDir).isDefined)
    // idempotence: an already-current refresh no-ops (watermark holds)
    val vView = Manifest.latestVersion(spark, viewDir)
    refresh()
    assert(Manifest.latestVersion(spark, viewDir) == vView,
      "a current view must not commit an empty refresh")
    // vacuumed A watermark: refresh degrades to one full rebuild
    (1 to 3).foreach(i => Manifest.append(spark, aDir,
      Seq((200L + i, 5L, 1L, 0L)).toDF("k", "j", "band", "p"), "p"))
    Manifest.unpin(spark, aDir, Manifest.pins(spark, aDir).keys
      .find(_.startsWith("viewa-")).get)
    Manifest.vacuumOrphans(spark, aDir, keepVersions = 1, staleMillis = 0L)
    refresh()
    assert(joinViewState(viewDir) ==
      joinRecompute(Manifest.read(spark, aDir), Manifest.read(spark, bDir)),
      "rebuild fallback must converge after the watermark was vacuumed")
  }
}
