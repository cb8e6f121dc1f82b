package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization over the events stream table — gap-based sessions, the
  * canonical stateful operation a training-data/event pipeline needs
  * beyond the reference's stateless daily buckets (SURVEY.md §2.I "not
  * present: session windows, mapGroupsWithState").
  *
  * Two implementations with identical session semantics:
  *  - batch: window functions (lag → new-session flag → running sum) —
  *    one shuffle on user_id, fully expressible to the SQL oracle;
  *  - streaming: `mapGroupsWithState` keeping one open session per user —
  *    state is O(users), events stream through.
  */
object Sessions {

  /** Batch sessionization: events within `gapMs` of the previous event of
    * the same user share a session. Works on millisecond epochs (exact
    * long arithmetic — identical in Spark and DuckDB). */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L,
                      userCol: String = "user_id", tsCol: String = "ts",
                      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("ms"), col(idCol))
    events
      .withColumn("ms", unix_millis(col(tsCol)))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"))
  }

  // -------- streaming (mapGroupsWithState) --------

  final case class SessionEvent(user_id: Long, ms: Long)
  /** Per-user state: the open session plus totals so far. */
  final case class UserSessions(userId: Long, sessionsClosed: Int,
                                openStartMs: Long, openLastMs: Long, openEvents: Int)

  /** Streaming sessionization: Update-mode summary per user per batch.
    * State holds only the open session (constant per user); each batch
    * folds its events in event-time order and closes sessions whose gap
    * exceeded `gapMs`. Late events older than the open session's last
    * timestamp are clamped into it — pair with a `withWatermark` upstream
    * to bound that. */
  def sessionizeStreaming(events: Dataset[SessionEvent], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[UserSessions] = {
    implicit val outEnc = Encoders.product[UserSessions]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[UserSessions]) =>
          val sorted = batch.map(_.ms).toArray.sorted
          var s = state.getOption.getOrElse(UserSessions(user, 0, -1L, -1L, 0))
          sorted.foreach { ms =>
            if (s.openEvents == 0) {
              s = s.copy(openStartMs = ms, openLastMs = ms, openEvents = 1)
            } else if (ms - s.openLastMs > gapMs) {
              s = s.copy(sessionsClosed = s.sessionsClosed + 1,
                openStartMs = ms, openLastMs = ms, openEvents = 1)
            } else {
              s = s.copy(openLastMs = math.max(s.openLastMs, ms),
                openEvents = s.openEvents + 1)
            }
          }
          state.update(s)
          s
      }
  }

  /** The matching writeStream output mode for [[sessionizeStreaming]]. */
  val streamingOutputMode: OutputMode = OutputMode.Update()

  // -------- streaming (flatMapGroupsWithState) --------

  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Int)
  final case class ClosedSession(user_id: Long, start_ms: Long,
                                 end_ms: Long, n_events: Int)

  /** Streaming sessionization emitting one record PER CLOSED SESSION —
    * the `flatMapGroupsWithState` shape, where output cardinality is
    * decoupled from group count (zero rows for a quiet user, several for
    * a bursty one), which `mapGroupsWithState`'s exactly-one-row
    * contract cannot express. Append mode: closed sessions are
    * immutable facts, so downstream sinks never see updates. State per
    * user is the open session only — O(users) regardless of stream
    * length, same bound as [[sessionizeStreaming]]. The still-open
    * session is emitted only when a later event closes it (pair with a
    * timeout or watermark policy to flush stragglers at end of stream). */
  def sessionizeStreamingFlat(events: Dataset[SessionEvent],
                              gapMs: Long = 30 * 60 * 1000L): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = batch.map(_.ms).toArray.sorted
          val closed = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          sorted.foreach { ms =>
            open match {
              case None =>
                open = Some(OpenSession(ms, ms, 1))
              case Some(o) if ms - o.lastMs > gapMs =>
                closed += ClosedSession(user, o.startMs, o.lastMs, o.nEvents)
                open = Some(OpenSession(ms, ms, 1))
              case Some(o) =>
                open = Some(OpenSession(o.startMs, math.max(o.lastMs, ms), o.nEvents + 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
