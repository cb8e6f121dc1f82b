package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity of the ONE-PASS write-stats path (stats collected during the
  * batch write via the WriteJobStatsTracker hook) against the legacy
  * read-back aggregation it replaced: both modes must produce
  * bit-identical manifest entries — partition value sets (sorted,
  * capped, overflow flag), null flags, row counts, min/max renderings
  * (incl. the zone-free epoch-micros TIMESTAMP form), bloom bitsets,
  * and CHECK-constraint enforcement. */
class ManifestWriteStatsSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String) =
    Files.createTempDirectory(s"graft-wstats-$tag").toString + "/tbl"

  /** A frame that exercises every stats feature: >64 distinct partition
    * values (overflow), a null partition value (has_null), null stat
    * values, a timestamp stat column, and a non-ASCII value (binary
    * UTF8 sort order vs Java string order). */
  private def messy = spark.range(0, 500)
    .select(
      $"id".as("k"),
      when($"id" % 97 === 0, lit(null)).otherwise($"id" * 1.5).as("v"),
      when($"id" % 89 === 0, lit(null))
        .otherwise(($"id" * 1000000L + 1500000000000000L)
          .cast("timestamp")).as("ts"),
      when($"id" % 101 === 0, lit(null))
        .when($"id" % 7 === 0, concat(lit("pé-"), $"id" % 80))
        .otherwise(concat(lit("p-"), $"id" % 80)).as("p"))

  private def withInline[A](on: Boolean)(f: => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    val old = conf.get(Manifest.WriteInlineStatsKey)
    conf.setBoolean(Manifest.WriteInlineStatsKey, on)
    try f
    finally if (old == null) conf.unset(Manifest.WriteInlineStatsKey)
    else conf.set(Manifest.WriteInlineStatsKey, old)
  }

  /** Entries keyed by part index (file names differ only in job UUID),
    * with the batch-dir-dependent path dropped. */
  private def entryMap(dir: String) = {
    val meta = Manifest.snapshotMeta(spark, dir)
    Manifest.entriesDataset(spark, meta).collect().toSeq.map { e =>
      val part = e.path.split('/').last.split('-')(1).toInt
      part -> e.copy(path = "")
    }.toMap
  }

  test("inline write stats == legacy read-back stats, field for field") {
    val dirA = newDir("inline"); val dirB = newDir("legacy")
    withInline(true)(Manifest.create(spark, dirA, messy, "p",
      statsCols = Seq("v", "ts", "k"), bloomCols = Seq("k")))
    withInline(false)(Manifest.create(spark, dirB, messy, "p",
      statsCols = Seq("v", "ts", "k"), bloomCols = Seq("k")))
    val (a, b) = (entryMap(dirA), entryMap(dirB))
    assert(a.keySet == b.keySet)
    a.keySet.toSeq.sorted.foreach { part =>
      assert(a(part) == b(part), s"entry mismatch for part $part:\n" +
        s"  inline: ${a(part)}\n  legacy: ${b(part)}")
    }
    // the bloom sidecars must carry identical bitsets per part file
    def bloomMap(dir: String) = {
      val batch = new org.apache.hadoop.fs.Path(dir, "data")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dataDir = new org.apache.hadoop.fs.Path(dir, "data")
      val b = batch.listStatus(dataDir).head.getPath
      spark.read.parquet(new org.apache.hadoop.fs.Path(b, "_bloom").toString)
        .collect().map(r => (r.getString(0).split('/').last.split('-')(1).toInt,
          r.getString(1)) -> r.getSeq[Long](2)).toMap
    }
    assert(bloomMap(dirA) == bloomMap(dirB))
    // and the two tables answer identically
    assert(Manifest.read(spark, dirA).orderBy($"k").collect().toSeq ==
      Manifest.read(spark, dirB).orderBy($"k").collect().toSeq)
  }

  test("stats-pruned reads agree between the two write modes") {
    val dirA = newDir("prune-i"); val dirB = newDir("prune-l")
    withInline(true)(Manifest.create(spark, dirA, messy, "p",
      statsCols = Seq("ts", "v")))
    withInline(false)(Manifest.create(spark, dirB, messy, "p",
      statsCols = Seq("ts", "v")))
    def cond = ($"ts" >= Timestamp.valueOf("2017-07-14 02:40:00") &&
      $"v" < 600.0)
    val qa = graft.plans.ManifestScan.scan(spark, dirA, Some("p"))
      .filter(cond).orderBy($"k").collect().toSeq
    val qb = graft.plans.ManifestScan.scan(spark, dirB, Some("p"))
      .filter(cond).orderBy($"k").collect().toSeq
    assert(qa == qb && qa.nonEmpty)
  }

  test("constraint violations abort identically in both modes") {
    Seq(true, false).foreach { inline =>
      val dir = newDir(s"viol-$inline")
      withInline(inline) {
        Manifest.create(spark, dir, messy.filter($"v" > 0), "p")
        Manifest.addConstraint(spark, dir, "v_pos", "v > 0")
        val e = intercept[Manifest.ConstraintViolationException] {
          Manifest.append(spark, dir,
            Seq((9001L, -1.0, Timestamp.valueOf("2020-01-01 00:00:00"), "p-1"),
              (9002L, 2.0, Timestamp.valueOf("2020-01-01 00:00:00"), "p-1"))
              .toDF("k", "v", "ts", "p"), "p")
        }
        assert(e.name == "v_pos" && e.rows == 1)
        assert(Manifest.versions(spark, dir).size == 2) // create + constraint
      }
    }
  }
}
