package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources
import graft.pipeline.Streaming

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: two sessions (45-min gap between event 3 and 4)
    (1L, 10L, t("2024-01-01 10:00:00")),
    (2L, 10L, t("2024-01-01 10:10:00")),
    (3L, 10L, t("2024-01-01 10:20:00")),
    (4L, 10L, t("2024-01-01 11:05:00")),
    // user 2: one session
    (5L, 20L, t("2024-01-01 09:00:00")),
    (6L, 20L, t("2024-01-01 09:29:59"))
  ).toDF("event_id", "user_id", "ts")

  test("batch sessionization: gap splits sessions, boundaries exact") {
    val s = Sessions.sessionizeBatch(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(s((10L, 1L)) == 3L) // first session: events 1-3
    assert(s((10L, 2L)) == 1L) // second session: event 4
    assert(s((20L, 1L)) == 2L) // 29:59 gap < 30 min keeps one session
    assert(s.size == 3)
  }

  test("streaming mapGroupsWithState agrees with batch across two micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, ms)
    val ds = mem.toDS().map { case (u, ms) => Sessions.SessionEvent(u, ms) }
    val q = Sessions.sessionizeStreaming(ds)
      .writeStream.outputMode(Sessions.streamingOutputMode)
      .format("memory").queryName("sessions_out").start()

    def ms(s: String) = Timestamp.valueOf(s).getTime
    mem.addData((10L, ms("2024-01-01 10:00:00")), (10L, ms("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData((10L, ms("2024-01-01 10:20:00")), (10L, ms("2024-01-01 11:05:00")),
      (20L, ms("2024-01-01 09:00:00")))
    q.processAllAvailable()
    q.stop()

    // memory sink in Update mode appends each update; take the last per user
    val last = spark.table("sessions_out").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(4))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
    // user 10: one closed session (3 events), open session holds event 4
    assert(last(10L) == ((1, 1)))
    // user 20: nothing closed, open session with 1 event
    assert(last(20L) == ((0, 1)))
  }

  test("flatMapGroupsWithState emits exactly the closed sessions, append-only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, ms)
    val ds = mem.toDS().map { case (u, ms) => Sessions.SessionEvent(u, ms) }
    val q = Sessions.sessionizeStreamingFlat(ds)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_flat_out").start()

    def ms(s: String) = Timestamp.valueOf(s).getTime
    // batch 1: user 10 opens a session (2 events) — nothing closes
    mem.addData((10L, ms("2024-01-01 10:00:00")), (10L, ms("2024-01-01 10:10:00")))
    q.processAllAvailable()
    assert(spark.table("sessions_flat_out").count() == 0)
    // batch 2: user 10's 11:05 event closes session 1; user 20 opens one
    mem.addData((10L, ms("2024-01-01 10:20:00")), (10L, ms("2024-01-01 11:05:00")),
      (20L, ms("2024-01-01 09:00:00")))
    q.processAllAvailable()
    // batch 3: a far-future user-10 event closes the second session too
    mem.addData((10L, ms("2024-01-02 00:00:00")))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sessions_flat_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted
    assert(closed.toSeq == Seq(
      (10L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:20:00"), 3),
      (10L, ms("2024-01-01 11:05:00"), ms("2024-01-01 11:05:00"), 1)))
  }

  test("evt_sessionize declared query runs on testdata and is deterministic") {
    val a = graft.SparkEntry.queries("evt_sessionize")(spark, sf001).collect()
    val b = graft.SparkEntry.queries("evt_sessionize")(spark, sf001).collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("native session_window agg closes sessions at the gap like ops.Sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("user_id", "ts")
    val q = Streaming.sessionWindowAgg(df, gap = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sw_out").start()
    mem.addData((10L, t("2024-01-01 10:00:00")), (10L, t("2024-01-01 10:10:00")),
      (10L, t("2024-01-01 10:20:00")), (10L, t("2024-01-01 11:05:00")))
    q.processAllAvailable()
    mem.addData((10L, t("2024-01-03 00:00:00"))) // advance watermark, close all
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sw_out")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // same split the batch/stateful sessionizers produce: 3 events + 1 event
    assert(out == Seq((10L, 1L), (10L, 3L)))
  }

  test("stream-stream join matches right events within the bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = Streaming.streamStreamJoin(
      clicks.toDF().toDF("user_id", "ts"),
      buys.toDF().toDF("r_user_id", "r_ts"),
      boundSeconds = 600L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    clicks.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
    buys.addData((1L, t("2024-01-01 10:05:00")),  // within 10 min → match
      (2L, t("2024-01-01 11:00:00")),             // outside bound → no match
      (3L, t("2024-01-01 10:01:00")))             // no click → no match
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj_out").select("user_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
  }

  test("streaming dedup by watermark drops redeliveries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = Streaming.dedupByWatermark(df, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    mem.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:00:00")),
      (2L, t("2024-01-01 10:01:00")))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 10:00:00"))) // redelivery in a later batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }
}
