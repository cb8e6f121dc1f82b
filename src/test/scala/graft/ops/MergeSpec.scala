package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def state(dir: String): Map[Long, (Double, Long)] =
    spark.read.parquet(dir)
      .select($"k", $"v", $"p".cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def partFiles(dir: String, p: Long): Map[String, (Long, Long)] = {
    val d = new java.io.File(s"$dir/p=$p")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("mergeInto: bootstrap, upsert, partition pruning, idempotence") {
    val dir = Files.createTempDirectory("graft-merge").toString + "/tbl"

    // bootstrap: keys 1..100, partition k/50 (0: 1-49, 1: 50-99, 2: 100)
    val base = spark.range(1, 101)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" / 50).cast("long").as("p"))
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    assert(state(dir) == (1L to 100L).map(k => k -> (k * 1.0, k / 50)).toMap)

    val before = partFiles(dir, 1) // partition 1 must survive untouched

    // updates touch partitions 0 (existing keys 10..20) and 2 (new keys
    // 130..140); partition 1 is not in the batch
    val updates = (spark.range(10, 21) union spark.range(130, 141))
      .select($"id".as("k"), ($"id" * 10.0).as("v"),
        when($"id" >= 100, 2L).otherwise(0L).as("p"))
    Merge.mergeInto(spark, dir, updates, Seq("k"), "p")

    val expect =
      (1L to 100L).map(k => k -> (k * 1.0, k / 50)).toMap ++
        (10L to 20L).map(k => k -> (k * 10.0, 0L)).toMap ++
        (130L to 140L).map(k => k -> (k * 10.0, 2L)).toMap
    assert(state(dir) == expect)

    // copy-on-write is partition-pruned: the untouched partition's files
    // are the SAME files, not rewritten copies
    assert(partFiles(dir, 1) == before,
      "partition 1 was rewritten despite not being in the update batch")

    // rerun of the same batch is a no-op on the answer (reference rerun
    // semantics: put_item of the same key+values)
    Merge.mergeInto(spark, dir, updates, Seq("k"), "p")
    assert(state(dir) == expect)
  }

  test("mergeInto: null update columns keep the target's value") {
    val dir = Files.createTempDirectory("graft-merge-null").toString + "/tbl"
    val base = Seq((1L, 5.0, 0L), (2L, 6.0, 0L)).toDF("k", "v", "p")
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    val upd = Seq((1L, Option.empty[Double], 0L), (2L, Some(60.0), 0L))
      .toDF("k", "v", "p")
    Merge.mergeInto(spark, dir, upd, Seq("k"), "p")
    assert(state(dir) == Map(1L -> (5.0, 0L), 2L -> (60.0, 0L)))
  }
}
