package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.ManifestScan

/** Regression cases for edge conditions of the manifest protocol:
  * pathological table roots, null merge keys, empty batches, legacy
  * stat renderings, and prefix-prune bounds. */
class ManifestEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def base = spark.range(1, 101)
    .select($"id".as("k"), ($"id" * 1.0).as("v"),
      ($"id" / 50).cast("long").as("p"))

  private def state(dir: String): Map[Long, (Double, Long)] =
    Manifest.read(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("table root ending in /data: DV masking still resolves file identity") {
    // the root's own `/data` segment makes `_metadata.file_path` contain
    // an overlapping `/data/data/` run — a left-to-right split on
    // `/data/` mis-relativizes and deleted rows silently resurrect
    val dir = Files.createTempDirectory("graft-edge").toString + "/data"
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir,
      Seq((7L, 0L), (70L, 1L)).toDF("k", "p"), Seq("k"), "p")
    assert(!state(dir).contains(7L) && !state(dir).contains(70L),
      "MoR delete must mask rows under a root whose path ends in /data")
    // rewrite paths (compact folds the DVs in) must stay masked too
    Manifest.compact(spark, dir, "p", smallBytes = 1L << 30)
    assert(!state(dir).contains(7L) && !state(dir).contains(70L),
      "deleted rows must not resurrect through compaction")
    assert(state(dir).size == 98)
  }

  test("upsertMor masks null-keyed target rows like copy-on-write upsert") {
    val withNull = base.unionByName(
      Seq((Option.empty[Long], 0.5, 0L)).toDF("k", "v", "p"))
    val upd = Seq((Option.empty[Long], 99.0, 0L)).toDF("k", "v", "p")

    val cow = Files.createTempDirectory("graft-edge").toString + "/tbl"
    Manifest.create(spark, cow, withNull, "p")
    Manifest.upsert(spark, cow, upd, Seq("k"), "p")

    val mor = Files.createTempDirectory("graft-edge").toString + "/tbl"
    Manifest.create(spark, mor, withNull, "p")
    Manifest.upsertMor(spark, mor, upd, Seq("k"), "p")

    // total-order sort (value, then key rendering): collect order of
    // tied rows is not a scan invariant
    def rows(dir: String) = Manifest.read(spark, dir).collect()
      .map(r => (Option(r.get(0)), r.getDouble(1)))
      .sortBy { case (k, v) => (v, k.map(_.toString).getOrElse("")) }
    assert(rows(mor).toSeq == rows(cow).toSeq,
      "null-keyed update must replace (not duplicate) the null-keyed row")
    assert(rows(mor).count(_._1.isEmpty) == 1,
      "exactly one null-keyed row must survive the MoR upsert")
  }

  test("upsertMor with an empty updates batch is a no-op, not a crash") {
    val dir = Files.createTempDirectory("graft-edge").toString + "/tbl"
    Manifest.create(spark, dir, base, "p")
    Manifest.upsertMor(spark, dir, base.limit(0), Seq("k"), "p")
    assert(Manifest.versions(spark, dir) == Seq(1L),
      "an empty batch must not commit a version")
    assert(state(dir).size == 100)
  }

  test("legacy wall-clock timestamp stats fail open (no prune, no throw)") {
    val dir = Files.createTempDirectory("graft-edge").toString + "/tbl"
    val df = spark.range(1, 10).select($"id".as("k"),
      to_timestamp(concat(lit("2024-03-0"), $"id".cast("string"))).as("ts"),
      lit(0L).as("p"))
    Manifest.create(spark, dir, df, "p", statsCols = Seq("ts"))
    // doctor the committed manifest: replace the epoch-micros stat
    // strings with the wall-clock renderings a pre-upgrade writer stored
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(dir, "_versions/v00000001"))
    val name = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next().trim finally in.close()
    val mPath = s"$dir/_manifests/$name"
    val doctored = spark.read.parquet(mPath)
      .withColumn("stat_mins", when(size($"stat_mins") > 0,
        array(lit("2024-03-01 00:00:00"))).otherwise($"stat_mins"))
      .withColumn("stat_maxs", when(size($"stat_maxs") > 0,
        array(lit("2024-03-09 00:00:00"))).otherwise($"stat_maxs"))
      .collect()
    val schema = spark.read.parquet(mPath).schema
    fs.delete(new Path(mPath), true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(doctored.toIndexedSeq, 1), schema)
      .coalesce(1).write.parquet(mPath)
    // a range read over the legacy stats must not throw and must not
    // wrongly prune — every row in range comes back
    val got = Manifest.readRange(spark, dir, "ts",
      Some("2024-03-02 00:00:00"), Some("2024-03-05 00:00:00")).count()
    assert(got == 4L, s"expected rows 2..5, got $got")
    // planner path too (ManifestFileIndex.admitRange)
    val planned = ManifestScan.scan(spark, dir)
      .filter($"ts" >= "2024-03-02" && $"ts" < "2024-03-06").count()
    assert(planned == got)
  }

  test("startsWith prune keeps files whose rows sit in [E000,FFFF] after the prefix") {
    val dir = Files.createTempDirectory("graft-edge").toString + "/tbl"
    // one file whose ONLY matching row has a private-use char right
    // after the prefix: under UTF-16 ordering it exceeds p + U+10FFFF
    // (a surrogate pair), so the old inclusive bound pruned the file
    val df = Seq(("p\uE000tail", 0L), ("q-other", 1L)).toDF("s", "p")
    Manifest.create(spark, dir, df, "p", statsCols = Seq("s"))
    val got = ManifestScan.scan(spark, dir, partitionCol = Some("p"))
      .filter($"s".startsWith("p")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("p\uE000tail"),
      "prefix filter must not prune the file holding the matching row")
    // an all-U+FFFF prefix has no successor: lower bound only, correct
    val got2 = ManifestScan.scan(spark, dir)
      .filter($"s".startsWith("\uFFFF")).count()
    assert(got2 == 0)
  }
}
