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
  *  - the cursor is a DIRECTORY of monotonically-named version files
  *    (`c00000042`), read as the max present: advancing writes a NEW
  *    name (temp + atomic rename to a fresh target, sound on every FS)
  *    and only then best-effort sweeps older ones — no step ever
  *    deletes the only copy, so a crash at ANY point leaves a readable
  *    cursor at either the old or the new position (both are correct
  *    under at-least-once);
  *  - the FIRST poll delivers the whole current snapshot as inserts
  *    (the standard CDC "initial load" convention), PINNED to the
  *    version the cursor will record — a concurrent commit cannot make
  *    the delivered rows disagree with `toV`;
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
  * survive downstream until reconciled). A cursor AHEAD of the table's
  * latest version (a dropped-and-recreated base) is a gap too — it is
  * never silently "current". A vacuum racing the delivery itself is
  * re-classified to [[FeedGapException]] as well, so gap handling has
  * one exception type whether the gap appeared before or during the
  * poll. */
object ChangeFeed {

  final case class FeedGapException(cursor: Long, oldest: Long,
                                    latest: Long)
    extends RuntimeException(
      s"change-feed cursor v$cursor cannot anchor a delivery (retained " +
        s"v$oldest..v$latest): vacuum dropped it or the base was " +
        "recreated — resync or widen retention")

  /** The cursor's RETENTION PIN name on the base table — derived from
    * the cursor dir so each consumer has exactly one pin and re-polls
    * advance it in place. */
  private[ops] def pinName(cursorDir: String): String =
    "feed-" + java.security.MessageDigest.getInstance("MD5")
      .digest(cursorDir.getBytes(StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString

  private def cursorFs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readCursor(spark: SparkSession, dir: String): Option[Long] = {
    val fs = cursorFs(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.matches("c\\d{8}")).map(_.drop(1).toLong)
      .maxOption
  }

  /** Publish `v` as a NEW cursor file, then sweep older ones. Both the
    * temp write and the rename target fresh names, and the sweep runs
    * only after the new cursor is durably in place — there is no
    * delete-then-rename window that could leave NO cursor behind. */
  private def writeCursor(spark: SparkSession, dir: String, v: Long): Unit = {
    val fs = cursorFs(spark, dir)
    val p = new Path(dir)
    fs.mkdirs(p)
    val target = new Path(p, f"c$v%08d")
    if (!fs.exists(target)) {
      val tmp = new Path(p, s".c-$v-${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        require(fs.exists(target), s"cursor commit failed for $target")
      }
    }
    // sweep every OTHER cursor file — including any HIGHER one left by
    // a dropped-and-recreated base, which max-reading would resurrect
    fs.listStatus(p).map(_.getPath).foreach { f =>
      val n = f.getName
      if ((n.matches("c\\d{8}") && n.drop(1).toLong != v) ||
        n.endsWith(".tmp")) fs.delete(f, false)
    }
  }

  /** Deliver pending changes to `f(changes, fromV, toV)` and advance
    * the cursor at `cursorDir`. Returns the cursor after the call
    * (unchanged when already current). `changes` carries the table
    * columns plus `change` ∈ ('insert','delete'); the first delivery
    * is the full snapshot as inserts with `fromV = 0`.
    *
    * `maxVersions` paces catch-up: a delivery spans at most that many
    * commits past the cursor, so a consumer that lagged a thousand
    * commits drains in bounded, individually-committed deliveries
    * (re-poll until the returned cursor stops moving) instead of one
    * giant diff — the cursor-side analog of the streaming source's
    * `maxVersionsPerTrigger`. The initial snapshot load is never
    * paced (it is one consistent version, not a range). */
  def poll(spark: SparkSession, baseDir: String, cursorDir: String,
           onGap: String = "fail", maxVersions: Long = Long.MaxValue)
          (f: (DataFrame, Long, Long) => Unit): Long = {
    require(onGap == "fail" || onGap == "resync", s"bad onGap '$onGap'")
    require(maxVersions >= 1, s"maxVersions must be positive, got $maxVersions")
    val retained = Manifest.versions(spark, baseDir)
    require(retained.nonEmpty, s"no table at $baseDir")
    val latest = retained.last
    def gap(c: Long): Nothing =
      throw FeedGapException(c, retained.head, latest)
    def initialLoad(fromV: Long): Long = {
      // PINNED to `latest`: a commit racing this poll cannot leak its
      // rows into a delivery labeled toV = latest
      f(Manifest.readVersion(spark, baseDir, latest)
          .withColumn("change", lit("insert")),
        fromV, latest)
      advance(latest)
      latest
    }
    /** Cursor + retention pin move together: once the cursor records
      * `v`, the pin tells vacuum that v must stay readable — the next
      * delivery anchors its diff there. */
    def advance(v: Long): Unit = {
      writeCursor(spark, cursorDir, v)
      Manifest.pin(spark, baseDir, pinName(cursorDir), v)
    }
    readCursor(spark, cursorDir) match {
      case None => initialLoad(0L)
      case Some(c) if c == latest => c
      case Some(c) if c > latest => // dropped-and-recreated base
        if (onGap == "fail") gap(c) else initialLoad(c)
      case Some(c) =>
        if (!retained.contains(c)) {
          if (onGap == "fail") gap(c)
          initialLoad(c)
        } else {
          // Pace: the delivery's upper bound is at most `maxVersions`
          // RETAINED commits past the cursor (retained versions are
          // the only valid diff endpoints — a vacuumed intermediate is
          // not a gap for the feed, just not an anchor candidate).
          val newer = retained.dropWhile(_ <= c)
          val toV =
            if (maxVersions >= newer.size) latest
            else newer(maxVersions.toInt - 1)
          try f(Manifest.changes(spark, baseDir, c, toV), c, toV)
          catch {
            // a vacuum racing the delivery surfaces as a read error on
            // version c's files: re-classify so gap handling stays one
            // exception type (the caller's retry then takes the
            // entry-time gap path)
            case t: Throwable
              if !Manifest.versions(spark, baseDir).contains(c) =>
              throw new FeedGapException(c, Manifest.versions(spark, baseDir)
                .headOption.getOrElse(latest), latest).initCause(t)
          }
          advance(toV)
          toV
        }
    }
  }

  /** Decommission a consumer: drop its retention pin from the base
    * table (vacuum stops waiting for it) and delete its cursor dir. */
  def retire(spark: SparkSession, baseDir: String, cursorDir: String): Unit = {
    Manifest.unpin(spark, baseDir, pinName(cursorDir))
    val fs = cursorFs(spark, cursorDir)
    fs.delete(new Path(cursorDir), true)
  }
}
