package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local fs that COUNTS pointer opens (`_versions/v*` reads) — the
  * probe for [[Manifest.replaySchemaOps]]'s watermark: a steady-state
  * replication tick must read O(new source versions), not re-walk the
  * full retained list every batch. */
class PointerCountingFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "cntfs"
  override def getUri: java.net.URI = java.net.URI.create("cntfs:///")
  override def open(p: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (p.toUri.getPath.contains("/_versions/"))
      PointerCountingFileSystem.opens.incrementAndGet()
    super.open(p, bufferSize)
  }
}
object PointerCountingFileSystem {
  val opens = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** [[Manifest.replaySchemaOps]] round-16 hardening: the per-source
  * replay WATERMARK (steady-state cost O(new versions) pointer reads)
  * and the `upToV` batch-horizon bound that keeps a rename committed
  * AFTER an in-flight CDC batch from replaying early (which would fork
  * the old column name and wedge the next batch on the both-names
  * refusal). */
class ReplayWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String) =
    Files.createTempDirectory(s"graft-replay-$tag").toString + "/tbl"

  private def base = spark.range(1, 11)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 2).as("p"))

  test("watermark: a steady-state replay reads ZERO source pointers") {
    spark.sparkContext.hadoopConfiguration.set("fs.cntfs.impl",
      classOf[PointerCountingFileSystem].getName)
    val local = newDir("wm")
    val src = s"cntfs://$local"
    val tgt = newDir("wmtgt")
    Manifest.create(spark, src, base, "p")
    Manifest.renameColumn(spark, src, "v", "amount")
    (1 to 8).foreach(i => Manifest.append(spark, src,
      Seq((100L + i, 1.0 * i, 0L)).toDF("k", "amount", "p"), "p"))
    Manifest.create(spark, tgt,
      base, "p")
    // first replay walks the retained list once and applies the rename
    assert(Manifest.replaySchemaOps(spark, tgt, src) == 1L)
    assert(Manifest.tableSchema(spark, tgt).fieldNames.toSet ==
      Set("k", "amount", "p"))
    // let the pointer-visibility freshness margin pass so versions()'s
    // own listing stops re-verifying young pointers — what remains is
    // exactly replaySchemaOps's behavior
    Thread.sleep(5200L)
    Manifest.versions(spark, src) // warm the visibility cache
    PointerCountingFileSystem.opens.set(0L)
    assert(Manifest.replaySchemaOps(spark, tgt, src) == 0L)
    assert(PointerCountingFileSystem.opens.get() == 0L,
      "a replay with nothing new must read NO source pointers " +
        s"(read ${PointerCountingFileSystem.opens.get()})")
    // one new rename: the next replay reads only the unreplayed tail
    Manifest.renameColumn(spark, src, "amount", "amt2")
    PointerCountingFileSystem.opens.set(0L)
    assert(Manifest.replaySchemaOps(spark, tgt, src) == 1L)
    val tail = PointerCountingFileSystem.opens.get()
    assert(tail <= 6L,
      s"replaying ONE new op must read O(1) pointers, read $tail")
    assert(Manifest.tableSchema(spark, tgt).fieldNames.toSet ==
      Set("k", "amt2", "p"))
  }

  test("upToV bounds the replay at the caller's horizon; watermark follows it") {
    val src = newDir("uptosrc"); val tgt = newDir("uptotgt")
    Manifest.create(spark, src, base, "p")
    Manifest.renameColumn(spark, src, "v", "amount") // v2
    // (the target is a plain table created with the OLD face)
    Manifest.create(spark, tgt, base, "p")
    // bounded BELOW the rename: nothing replays, nothing watermarks past 1
    assert(Manifest.replaySchemaOps(spark, tgt, src, Some(1L)) == 0L)
    assert(Manifest.tableSchema(spark, tgt).fieldNames.toSet ==
      Set("k", "v", "p"))
    // raised to the rename's version: it replays now
    assert(Manifest.replaySchemaOps(spark, tgt, src, Some(2L)) == 1L)
    assert(Manifest.tableSchema(spark, tgt).fieldNames.toSet ==
      Set("k", "amount", "p"))
    // idempotent + watermarked: an unbounded re-run applies nothing
    assert(Manifest.replaySchemaOps(spark, tgt, src) == 0L)
  }

  test("a rename racing an in-flight CDC batch does NOT fork the old column or wedge the stream") {
    val src = newDir("racesrc"); val tgt = newDir("racetgt")
    Manifest.create(spark, src, base, "p") // v1
    Manifest.append(spark, src,
      Seq((100L, 100.0, 0L)).toDF("k", "v", "p"), "p") // v2
    // bootstrap the replica from the v1 snapshot rows
    val boot = base
      .withColumn("change", lit("insert"))
      .withColumn("_commit_version", lit(1L))
    assert(Manifest.applyChangesIfAbsent(spark, tgt, boot, Seq("k"), "p",
      "race-app", 1L, orderCol = Some("_commit_version"),
      evolveSchema = true, schemaFrom = Some(src)))
    // the rename lands AFTER the in-flight batch's end version (v2):
    // the batch still speaks the OLD name
    Manifest.renameColumn(spark, src, "v", "amount") // v3
    val batch2 = Seq((100L, 100.0, 0L)).toDF("k", "v", "p")
      .withColumn("change", lit("insert"))
      .withColumn("_commit_version", lit(2L))
    assert(Manifest.applyChangesIfAbsent(spark, tgt, batch2, Seq("k"), "p",
      "race-app", 2L, orderCol = Some("_commit_version"),
      evolveSchema = true, schemaFrom = Some(src)))
    // an early replay would have renamed the target, then evolve-folded
    // the batch's old `v` into a FRESH column — the fork
    val mid = Manifest.tableSchema(spark, tgt).fieldNames.toSet
    assert(mid == Set("k", "v", "p"),
      s"the rename must not replay before its rows arrive; target has $mid")
    // rows from beyond the rename arrive under the NEW name: the
    // replay now applies first and the batch lands clean — the old
    // unbounded behavior would wedge HERE on the both-names refusal
    val batch3 = Seq((200L, 200.0, 1L)).toDF("k", "amount", "p")
      .withColumn("change", lit("insert"))
      .withColumn("_commit_version", lit(4L))
    assert(Manifest.applyChangesIfAbsent(spark, tgt, batch3, Seq("k"), "p",
      "race-app", 3L, orderCol = Some("_commit_version"),
      evolveSchema = true, schemaFrom = Some(src)))
    val after = Manifest.tableSchema(spark, tgt).fieldNames.toSet
    assert(after == Set("k", "amount", "p"),
      s"the rename replays once its rows do; target has $after")
    val ks = Manifest.read(spark, tgt).select("k").as[Long].collect().toSet
    assert(ks.contains(200L) && ks.contains(100L) && ks.contains(1L))
  }
}
