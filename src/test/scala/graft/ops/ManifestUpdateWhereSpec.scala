package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate UPDATE (`UPDATE t SET ... WHERE p`): planned from the same
  * metadata tiers as [[Manifest.deleteWhere]] — provably-clean files
  * carry by reference, straddlers rewrite with the SET applied to
  * matching rows (CoW) or get one deletion vector + updated re-inserts
  * (MoR [[Manifest.updateWhereMor]]). */
class ManifestUpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-updw").toString + "/tbl"

  private def twoBands(dir: String): Unit = {
    val lo = spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    val hi = spark.range(100, 200)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    Manifest.create(spark, dir, lo, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir, hi, "p")
  }

  private def state(dir: String): Map[Long, Double] =
    Manifest.read(spark, dir).select("k", "v")
      .as[(Long, Double)].collect().toMap

  private def baseState = (0L until 200L).map(k => k -> k * 1.0).toMap

  private def files(dir: String): Set[String] =
    Manifest.read(spark, dir).inputFiles
      .map(f => new Path(f).toUri.getPath)
      .filter(_.contains("/data/")).toSet

  test("stats tier: clean files carried by reference, straddlers rewritten with SET applied") {
    val dir = newDir()
    twoBands(dir)
    val loFiles = Manifest.read(spark, dir)
      .withColumn("__f", col("_metadata.file_path"))
      .filter(col("v") < 100).select("__f").distinct().as[String].collect()
      .map(f => new Path(f).toUri.getPath).toSet
    val out = Manifest.updateWhere(spark, dir,
      Seq("v" -> "v + 1000.0"), "v >= 150.0", "p")
    assert(out("files_rewritten") > 0L && out("files_untouched") > 0L)
    assert(loFiles.subsetOf(files(dir)),
      "provably-clean files must carry by reference")
    assert(state(dir) == baseState.map { case (k, v) =>
      k -> (if (v >= 150.0) v + 1000.0 else v) })
  }

  test("WHERE true updates the whole table as one overwrite-shaped commit") {
    val dir = newDir()
    twoBands(dir)
    val v0 = Manifest.versions(spark, dir).max
    val out = Manifest.updateWhere(spark, dir,
      Seq("v" -> "-v"), "true", "p")
    assert(out("files_untouched") == 0L)
    assert(Manifest.versions(spark, dir).max == v0 + 1)
    assert(state(dir) == baseState.map { case (k, v) => k -> -v })
    // the table stays writable
    Manifest.append(spark, dir, Seq((999L, 9.0, 9L)).toDF("k", "v", "p"), "p")
    assert(state(dir).contains(999L))
  }

  test("rows where the predicate is NULL stay unchanged; no-match commits nothing") {
    val dir = newDir()
    Manifest.create(spark, dir,
      Seq((1L, Some(5.0), 0L), (2L, Option.empty[Double], 0L))
        .toDF("k", "v", "p"), "p", statsCols = Seq("v"))
    Manifest.updateWhere(spark, dir, Seq("v" -> "v * 10.0"), "v > 0.0", "p")
    val s = Manifest.read(spark, dir).select("k", "v")
      .as[(Long, Option[Double])].collect().toMap
    assert(s == Map(1L -> Some(50.0), 2L -> None),
      "the null-predicate row must stay unchanged")
    val v0 = Manifest.versions(spark, dir).max
    val none = Manifest.updateWhere(spark, dir,
      Seq("v" -> "0.0"), "v > 1000.0", "p")
    assert(none("files_rewritten") == 0L)
    assert(Manifest.versions(spark, dir).max == v0,
      "a no-match update must not commit")
  }

  test("updateWhereMor: one vector + updated re-inserts, no candidate rewritten") {
    val dir = newDir()
    twoBands(dir)
    val before = files(dir)
    val out = Manifest.updateWhereMor(spark, dir,
      Seq("v" -> "v + 1000.0"), "v >= 150.0 AND v < 160.0", "p")
    assert(out("files_masked") > 0L)
    assert(before.subsetOf(files(dir)),
      "MoR update must only ADD files — candidates stay on disk and live")
    assert(state(dir) == baseState.map { case (k, v) =>
      k -> (if (v >= 150.0 && v < 160.0) v + 1000.0 else v) })
    // CoW rewrite afterwards must not resurrect the masked originals
    Manifest.updateWhere(spark, dir,
      Seq("v" -> "v - 1.0"), "v >= 1150.0 AND v < 1160.0", "p")
    assert(state(dir) == baseState.map { case (k, v) =>
      k -> (if (v >= 150.0 && v < 160.0) v + 999.0 else v) })
  }

  test("SET on the partition column moves rows; later partition ops see them") {
    val dir = newDir()
    Manifest.create(spark, dir,
      spark.range(0, 40).select($"id".as("k"), ($"id" * 1.0).as("v"),
        ($"id" % 2).as("p")), "p")
    Manifest.updateWhere(spark, dir, Seq("p" -> "7"), "k < 10", "p")
    val byP = Manifest.read(spark, dir).groupBy("p").count()
      .as[(Long, Long)].collect().toMap
    assert(byP(7L) == 10L)
    // the moved rows are visible to a partition-exact delete
    Manifest.deleteWhere(spark, dir, "p = 7", "p")
    assert(state(dir).keySet == (10L until 40L).toSet)
  }

  test("a CHECK-violating update fails loudly and commits nothing") {
    val dir = newDir()
    twoBands(dir)
    Manifest.addConstraint(spark, dir, "v_floor", "v >= 0.0")
    val v0 = Manifest.versions(spark, dir).max
    intercept[Exception] {
      Manifest.updateWhere(spark, dir, Seq("v" -> "-1.0"), "k = 5", "p")
    }
    assert(Manifest.versions(spark, dir).max == v0)
    assert(state(dir) == baseState)
  }

  test("logical names on a renamed table; SET-list refusals") {
    val dir = newDir()
    twoBands(dir)
    Manifest.renameColumn(spark, dir, "v", "score")
    Manifest.updateWhere(spark, dir,
      Seq("score" -> "score * 2.0"), "score < 3.0 AND k < 3", "p")
    val s = Manifest.read(spark, dir).select("k", "score")
      .as[(Long, Double)].collect().toMap
    assert(s(0L) == 0.0 && s(1L) == 2.0 && s(2L) == 4.0 && s(5L) == 5.0)
    intercept[IllegalArgumentException] {
      Manifest.updateWhere(spark, dir, Seq("nope" -> "1"), "true", "p")
    }
    intercept[IllegalArgumentException] {
      Manifest.updateWhere(spark, dir,
        Seq("score" -> "1.0", "SCORE" -> "2.0"), "true", "p")
    }
    intercept[IllegalArgumentException] {
      Manifest.updateWhere(spark, dir, Nil, "true", "p")
    }
  }
}
