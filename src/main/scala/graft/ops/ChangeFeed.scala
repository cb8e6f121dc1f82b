package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic cursor-based consumption of a [[Manifest]] table's row-level
  * change feed — the downstream half of CDC for consumers that are NOT
  * manifest tables themselves (push to a KV store, emit events, feed a
  * search index). [[Incremental]] is the exactly-once special case
  * where the consumer's output IS a manifest table and the watermark
  * rides its commit; this cursor serves everything else with
  * foreachBatch-style AT-LEAST-ONCE semantics:
  *
  *  - [[poll]] hands `f` the changes between the cursor and the
  *    latest version, then advances the cursor ONLY after `f` returns
  *    — a crash inside `f` replays the same range on the next poll, so
  *    `f` must be idempotent (keyed upserts are; append-blind sinks
  *    are not);
  *  - the cursor is a one-line file committed by temp-write + atomic
  *    rename, so a torn write can never produce a half-cursor;
  *  - the FIRST poll delivers the whole current snapshot as inserts
  *    (the standard CDC "initial load" convention), so a consumer
  *    bootstraps and stays current through one code path;
  *  - rows within a delivery are UNORDERED — a key's update arrives as
  *    its delete+insert pair in arbitrary row order, so a keyed
  *    consumer must apply the delivery's deletes before its inserts
  *    (or net changes by key) rather than streaming rows one by one.
  *
  * If vacuum dropped the cursor's snapshot, the feed has a GAP that
  * replay cannot bridge. `onGap = "fail"` (default) throws — the
  * operator decides; `onGap = "resync"` re-delivers the full current
  * snapshot as inserts, which is only correct for consumers whose
  * apply is a full upsert by key (deletes missed during the gap
  * survive downstream until reconciled). */
object ChangeFeed {

  final case class FeedGapException(cursor: Long, oldest: Long)
    extends RuntimeException(
      s"change-feed cursor v$cursor was vacuumed (oldest retained " +
        s"v$oldest): replay cannot bridge the gap — resync or widen " +
        "retention")

  private def readCursor(spark: SparkSession, path: String): Option[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  private def writeCursor(spark: SparkSession, path: String, v: Long): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p)) { // rename-over requires a delete on HDFS
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"cursor commit failed for $path")
    }
  }

  /** Deliver pending changes to `f(changes, fromV, toV)` and advance
    * the cursor at `cursorPath`. Returns the cursor after the call
    * (unchanged when already current). `changes` carries the table
    * columns plus `change` ∈ ('insert','delete'); the first delivery
    * is the full snapshot as inserts with `fromV = 0`. */
  def poll(spark: SparkSession, baseDir: String, cursorPath: String,
           onGap: String = "fail")
          (f: (DataFrame, Long, Long) => Unit): Long = {
    require(onGap == "fail" || onGap == "resync", s"bad onGap '$onGap'")
    val latest = Manifest.latestVersion(spark, baseDir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $baseDir"))
    def initialLoad(fromV: Long): Long = {
      f(Manifest.read(spark, baseDir).withColumn("change", lit("insert")),
        fromV, latest)
      writeCursor(spark, cursorPath, latest)
      latest
    }
    readCursor(spark, cursorPath) match {
      case None => initialLoad(0L)
      case Some(c) if c >= latest => c
      case Some(c) =>
        val retained = Manifest.versions(spark, baseDir)
        if (!retained.contains(c)) {
          if (onGap == "fail") throw FeedGapException(c, retained.head)
          initialLoad(c)
        } else {
          f(Manifest.changes(spark, baseDir, c, latest), c, latest)
          writeCursor(spark, cursorPath, latest)
          latest
        }
    }
  }
}
