package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cursor-based change-feed consumption: initial load, incremental
  * deliveries, at-least-once replay, gap handling. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = Files.createTempDirectory("graft-cf").toString

  private def base = spark.range(1, 61)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 3).as("p"))

  /** A keyed-upsert consumer (idempotent apply) over a plain map. */
  private class KvSink {
    val state = scala.collection.mutable.Map[Long, Double]()
    var deliveries = 0
    def apply(changes: DataFrame, fromV: Long, toV: Long): Unit = {
      deliveries += 1
      // the feed is UNORDERED within a delivery: an update arrives as
      // its delete+insert pair in arbitrary row order, so a keyed
      // consumer applies deletes first (the documented contract)
      val rows = changes.select("k", "v", "change").collect()
      rows.filter(_.getString(2) == "delete")
        .foreach(r => state.remove(r.getLong(0)))
      rows.filter(_.getString(2) == "insert")
        .foreach(r => state(r.getLong(0)) = r.getDouble(1))
    }
  }

  private def tableState(dir: String): Map[Long, Double] =
    Manifest.read(spark, dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("initial load, then incremental deliveries keep a KV sink convergent") {
    val root = newDir()
    val dir = s"$root/tbl"; val cur = s"$root/cursor"
    Manifest.create(spark, dir, base, "p")
    val sink = new KvSink

    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 1L)
    assert(sink.state.toMap == tableState(dir) && sink.deliveries == 1)

    // current cursor: no delivery
    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 1L)
    assert(sink.deliveries == 1)

    Manifest.upsert(spark, dir, Seq((5L, 555.0, 2L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 1L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 2L)).toDF("k", "v", "p"), "p")
    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 4L)
    assert(sink.deliveries == 2)
    assert(sink.state.toMap == tableState(dir))
  }

  test("maxVersions paces catch-up into bounded, individually-committed deliveries") {
    val root = newDir()
    val dir = s"$root/tbl"; val cur = s"$root/cursor"
    Manifest.create(spark, dir, base, "p")
    val sink = new KvSink
    // initial snapshot load is never paced
    assert(ChangeFeed.poll(spark, dir, cur, maxVersions = 1L)(sink.apply) == 1L)
    (1 to 5).foreach { i =>
      Manifest.append(spark, dir,
        Seq((1000L + i, i.toDouble, 0L)).toDF("k", "v", "p"), "p")
    }
    // 5 commits behind, paced 2 per delivery: 3 polls drain the lag,
    // each advancing (and durably committing) its own cursor
    assert(ChangeFeed.poll(spark, dir, cur, maxVersions = 2L)(sink.apply) == 3L)
    assert(ChangeFeed.poll(spark, dir, cur, maxVersions = 2L)(sink.apply) == 5L)
    assert(ChangeFeed.poll(spark, dir, cur, maxVersions = 2L)(sink.apply) == 6L)
    assert(sink.deliveries == 4)
    assert(sink.state.toMap == tableState(dir))
    // drained: a paced poll on a current cursor is a no-op
    assert(ChangeFeed.poll(spark, dir, cur, maxVersions = 2L)(sink.apply) == 6L)
    assert(sink.deliveries == 4)
  }

  test("a crash inside f replays the same range (at-least-once)") {
    val root = newDir()
    val dir = s"$root/tbl"; val cur = s"$root/cursor"
    Manifest.create(spark, dir, base, "p")
    val sink = new KvSink
    ChangeFeed.poll(spark, dir, cur)(sink.apply)
    Manifest.delete(spark, dir, Seq((1L, 1L)).toDF("k", "p"), Seq("k"), "p")

    intercept[RuntimeException] {
      ChangeFeed.poll(spark, dir, cur) { (_, _, _) =>
        throw new RuntimeException("consumer crash")
      }
    }
    // cursor did NOT advance; the next poll redelivers and converges
    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 2L)
    assert(sink.state.toMap == tableState(dir))
  }

  test("vacuumed cursor: fail by default, resync re-bootstraps an upsert consumer") {
    val root = newDir()
    val dir = s"$root/tbl"; val cur = s"$root/cursor"
    Manifest.create(spark, dir, base, "p")
    val sink = new KvSink
    ChangeFeed.poll(spark, dir, cur)(sink.apply)
    Manifest.upsert(spark, dir, Seq((5L, 555.0, 2L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 2L)).toDF("k", "v", "p"), "p")
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L,
      force = true) // the cursor's pin would (rightly) refuse this

    intercept[ChangeFeed.FeedGapException] {
      ChangeFeed.poll(spark, dir, cur)(sink.apply)
    }
    assert(ChangeFeed.poll(spark, dir, cur, onGap = "resync")(sink.apply) == 3L)
    // upsert-by-key consumer converges on inserts/updates (gap deletes
    // would linger — documented contract)
    assert(sink.state(5L) == 555.0 && sink.state(200L) == 2.0)
    assert(sink.state.toMap == tableState(dir))
  }

  test("a dropped-and-recreated base is a GAP, never silently 'current'") {
    val root = newDir()
    val dir = s"$root/tbl"; val cur = s"$root/cursor"
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 2L)).toDF("k", "v", "p"), "p")
    Manifest.append(spark, dir, Seq((201L, 2.1, 2L)).toDF("k", "v", "p"), "p")
    val sink = new KvSink
    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 3L)

    // drop + recreate: versions restart at 1, cursor (3) is now AHEAD
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    Manifest.create(spark, dir, base, "p")

    intercept[ChangeFeed.FeedGapException] {
      ChangeFeed.poll(spark, dir, cur)(sink.apply)
    }
    assert(ChangeFeed.poll(spark, dir, cur, onGap = "resync")(sink.apply) == 1L)
    assert(sink.state.toMap == tableState(dir) ++ Map(200L -> 2.0, 201L -> 2.1))
    // the stale higher cursor file was swept: next poll is current
    val before = sink.deliveries
    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 1L)
    assert(sink.deliveries == before)
  }
  test("retention pin: vacuum blocked while the cursor lags, allowed after it advances") {
    val root = newDir()
    val dir = s"$root/tbl"; val cur = s"$root/cursor"
    Manifest.create(spark, dir, base, "p")
    val sink = new KvSink
    ChangeFeed.poll(spark, dir, cur)(sink.apply) // cursor + pin at v1
    Manifest.upsert(spark, dir, Seq((5L, 555.0, 2L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 2L)).toDF("k", "v", "p"), "p")

    // the cursor still anchors on v1 — dropping to keepVersions=1 would
    // gap it, so vacuum REFUSES before touching anything
    val ex = intercept[Manifest.RetentionPinnedException] {
      Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    }
    assert(ex.pins.values.toSeq == Seq(1L) && ex.oldestKept == 3L)
    // nothing was reclaimed: the lagging consumer still replays cleanly
    assert(ChangeFeed.poll(spark, dir, cur)(sink.apply) == 3L)
    assert(sink.state.toMap == tableState(dir))

    // cursor advanced to v3 -> the same vacuum now proceeds
    assert(Manifest.pins(spark, dir).values.toSeq == Seq(3L))
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    assert(Manifest.versions(spark, dir) == Seq(3L))

    // retiring the consumer removes its pin entirely
    ChangeFeed.retire(spark, dir, cur)
    assert(Manifest.pins(spark, dir).isEmpty)
  }
}
