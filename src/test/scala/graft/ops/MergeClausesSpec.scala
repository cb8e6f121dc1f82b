package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeClause._

/** Conditional-clause MERGE INTO ([[Manifest.mergeClauses]]): the full
  * `WHEN MATCHED [AND c] / NOT MATCHED [AND c] / NOT MATCHED BY SOURCE
  * [AND c]` algebra as one atomic merge-on-read commit. Pins clause
  * precedence (first-match-wins), the by-source side, the
  * multiple-match refusal, star-form expansion, and that the whole
  * outcome is a single snapshot version. */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-mrgc").toString + "/tbl"

  /** Target: k 0..9, v = k*10, p = k%2. */
  private def mkTarget(dir: String): Unit =
    Manifest.create(spark,
      dir,
      spark.range(10).select($"id".as("k"), ($"id" * 10).as("v"),
        ($"id" % 2).as("p")),
      "p")

  private def rows(dir: String): Map[Long, Long] =
    Manifest.read(spark, dir).select("k", "v").as[(Long, Long)]
      .collect().toMap

  test("matched UPDATE/DELETE with conditions, NOT MATCHED INSERT, one commit") {
    val dir = newDir()
    mkTarget(dir)
    val v0 = Manifest.latestVersion(spark, dir).get
    // source: k 6..13; op D on k=6,8 (delete), else upsert with v = k*100
    val src = spark.range(6, 14).select($"id".as("k"),
      ($"id" * 100).as("nv"), when($"id" % 2 === 0 && $"id" < 10, "D")
        .otherwise("U").as("op"), ($"id" % 2).as("p"))
    val out = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(
        Matched(Delete, cond = Some("s.op = 'D'")),
        Matched(Update(Seq("v" -> "s.nv")))),
      notMatched = Seq(
        NotMatched(Seq("k" -> "s.k", "v" -> "s.nv", "p" -> "s.p"))))
    assert(out == Map("rows_updated" -> 2L, "rows_deleted" -> 2L,
      "rows_inserted" -> 4L))
    val got = rows(dir)
    assert(!got.contains(6L) && !got.contains(8L)) // matched DELETE
    assert(got(7L) == 700L && got(9L) == 900L) // matched UPDATE
    assert(got(10L) == 1000L && got(13L) == 1300L) // inserts
    assert(got(0L) == 0L && got(5L) == 50L) // untouched
    // atomicity: exactly ONE new version for the whole clause set
    assert(Manifest.latestVersion(spark, dir).contains(v0 + 1))
  }

  test("clause precedence is first-match-wins within a group") {
    val dir = newDir()
    mkTarget(dir)
    val src = spark.range(0, 4)
      .select($"id".as("k"), lit(1L).as("nv"), ($"id" % 2).as("p"))
    // both clauses match every row; the FIRST one must win
    Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(
        Matched(Update(Seq("v" -> "-1")), cond = Some("s.k >= 0")),
        Matched(Delete)))
    val got = rows(dir)
    assert((0L to 3L).forall(k => got(k) == -1L),
      "the later DELETE clause must never fire on rows the first UPDATE took")
    assert(got.size == 10)
  }

  test("NOT MATCHED BY SOURCE: conditional UPDATE then DELETE sweep") {
    val dir = newDir()
    mkTarget(dir)
    // source covers k 0..4 only; by-source rows: k 5..9
    val src = spark.range(5).select($"id".as("k"), ($"id" % 2).as("p"))
    val out = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      notMatchedBySource = Seq(
        NotMatchedBySource(Update(Seq("v" -> "t.v + 1")),
          cond = Some("t.k < 7")),
        NotMatchedBySource(Delete)))
    assert(out("rows_updated") == 2L && out("rows_deleted") == 3L)
    val got = rows(dir)
    assert(got(5L) == 51L && got(6L) == 61L) // by-source UPDATE (k<7)
    assert(!got.contains(7L) && !got.contains(9L)) // by-source DELETE
    assert(got(0L) == 0L && got(4L) == 40L) // matched rows untouched
  }

  test("UPDATE SET * and INSERT * expand to the source's same-named columns") {
    val dir = newDir()
    mkTarget(dir)
    val src = spark.range(8, 12).select($"id".as("k"),
      ($"id" * 1000).as("v"), ($"id" % 2).as("p"))
    val out = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(Matched(Update(Nil))),
      notMatched = Seq(NotMatched(Nil)))
    assert(out == Map("rows_updated" -> 2L, "rows_deleted" -> 0L,
      "rows_inserted" -> 2L))
    val got = rows(dir)
    assert(got(8L) == 8000L && got(9L) == 9000L)
    assert(got(10L) == 10000L && got(11L) == 11000L)
  }

  test("multiple source rows modifying one target row are refused, nothing committed") {
    val dir = newDir()
    mkTarget(dir)
    val v0 = Manifest.latestVersion(spark, dir).get
    val src = Seq((3L, 1L), (3L, 2L)).toDF("k", "nv")
      .withColumn("p", $"k" % 2)
    val e = intercept[IllegalArgumentException] {
      Manifest.mergeClauses(spark, dir, src,
        on = Seq("k" -> "k"), partitionCol = "p",
        matched = Seq(Matched(Update(Seq("v" -> "s.nv")))))
    }
    assert(e.getMessage.contains("multiple source rows"))
    assert(Manifest.latestVersion(spark, dir).contains(v0),
      "a refused merge must not commit")
    assert(rows(dir)(3L) == 30L)
    // the SAME duplicate keys are fine when only one pair ACTS
    val out = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(Matched(Update(Seq("v" -> "s.nv")),
        cond = Some("s.nv = 2"))))
    assert(out("rows_updated") == 1L)
    assert(rows(dir)(3L) == 2L)
  }

  test("unmatched rows with no applicable clause are untouched; NULL keys never match") {
    val dir = newDir()
    mkTarget(dir)
    val src = Seq((Some(2L), 99L, 0L), (None, 77L, 1L))
      .toDF("k", "nv", "p")
    // no notMatched clause: the NULL-keyed source row does nothing
    val out = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(Matched(Update(Seq("v" -> "s.nv")))))
    assert(out == Map("rows_updated" -> 1L, "rows_deleted" -> 0L,
      "rows_inserted" -> 0L))
    val got = rows(dir)
    assert(got(2L) == 99L && got.size == 10)
  }

  test("merge works on a renamed (column-mapped) table over visible names") {
    val dir = newDir()
    mkTarget(dir)
    Manifest.renameColumn(spark, dir, "v", "amount")
    val src = spark.range(9, 12).select($"id".as("k"),
      ($"id" * 2).as("newAmount"), ($"id" % 2).as("p"))
    Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(Matched(Update(Seq("amount" -> "s.newAmount")))),
      notMatched = Seq(NotMatched(Seq("k" -> "s.k",
        "amount" -> "s.newAmount", "p" -> "s.p"))))
    val got = Manifest.read(spark, dir).select("k", "amount")
      .as[(Long, Long)].collect().toMap
    assert(got(9L) == 18L && got(10L) == 20L && got(11L) == 22L)
    assert(got(0L) == 0L)
  }

  test("non-partition-key merge: all-new keys insert through an empty touched set") {
    // ON k (not the partition col) drives the broadcast-probe
    // findTouchedFiles path; a source matching NOTHING must still
    // insert every row (phase 2 runs against zero candidate files)
    val dir = newDir()
    mkTarget(dir)
    val src = spark.range(100, 103).select($"id".as("k"),
      ($"id" * 5).as("nv"), ($"id" % 2).as("p"))
    val out = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(Matched(Update(Seq("v" -> "s.nv")))),
      notMatched = Seq(NotMatched(Seq("k" -> "s.k", "v" -> "s.nv",
        "p" -> "s.p"))))
    assert(out == Map("rows_updated" -> 0L, "rows_deleted" -> 0L,
      "rows_inserted" -> 3L))
    val got = rows(dir)
    assert(got(100L) == 500L && got(102L) == 510L && got.size == 13)
  }

  test("change feed sees merge deletes and updates as one version's changes") {
    val dir = newDir()
    mkTarget(dir)
    val v0 = Manifest.latestVersion(spark, dir).get
    val src = spark.range(4, 7).select($"id".as("k"),
      lit(0L).as("nv"), ($"id" % 2).as("p"))
    Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(
        Matched(Delete, cond = Some("s.k = 4")),
        Matched(Update(Seq("v" -> "s.nv")))))
    val ch = Manifest.changes(spark, dir, v0, v0 + 1)
      .select("k", "change").as[(Long, String)].collect()
    val byKind = ch.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byKind("delete").contains(4L))
    assert(byKind.getOrElse("insert", Set()) == Set(5L, 6L))
    // updates surface as delete(old)+insert(new) or update rows —
    // either way 5 and 6's old images must be retired
    assert(byKind.values.flatten.toSet.contains(5L))
  }
}
