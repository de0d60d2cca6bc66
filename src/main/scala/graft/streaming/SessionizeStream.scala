package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming sessionization with explicit keyed state
 * (`flatMapGroupsWithState`): per user, events accumulate into an open
 * session; a gap > 30 minutes closes the session and emits it. The
 * same 30-minute-gap semantics as the batch `q_sessionize` operator,
 * whose windowed lag/cumsum plan is the oracle-checked twin.
 *
 * State per key is O(1) (open-session aggregates only — no event
 * buffering), so state-store size is #active-users, not #events:
 * the posture that survives unbounded streams.
 */
object SessionizeStream {

  val GapMicros: Long = 30L * 60 * 1000000

  /** Dormant-tombstone retention (ms of event time) before state eviction. */
  val TombstoneTtlMs: Long = 7L * 24 * 3600 * 1000

  /** `ts` carries the watermarked event-time column (required by
    * EventTimeTimeout); `tsMicros` is its exact microsecond value. */
  final case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      tsMicros: Long, value: Double)

  final case class OpenSession(
      sessionSeq: Long, startMicros: Long, lastMicros: Long, nEvents: Long, sumValue: Double)

  final case class ClosedSession(
      user_id: Long, session_seq: Long, n_events: Long,
      start_micros: Long, end_micros: Long, session_value: Double)

  /**
   * Fold a user's new (unsorted within the micro-batch) events into
   * the open-session state; emit every session closed by a gap.
   *
   * A state row with nEvents == 0 is a TOMBSTONE left by a timeout
   * closure: no session is open, but `sessionSeq` records the last
   * closed sequence so numbering stays aligned with the batch twin.
   */
  def updateUser(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toArray.sortBy(e => (e.tsMicros, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption.orNull
    sorted.foreach { e =>
      if (cur == null) {
        cur = OpenSession(1L, e.tsMicros, e.tsMicros, 1L, e.value)
      } else if (cur.nEvents == 0L) { // tombstone: resume numbering after a timeout close
        cur = OpenSession(cur.sessionSeq + 1, e.tsMicros, e.tsMicros, 1L, e.value)
      } else if (e.tsMicros - cur.lastMicros > GapMicros) {
        out += ClosedSession(userId, cur.sessionSeq, cur.nEvents,
          cur.startMicros, cur.lastMicros, cur.sumValue)
        cur = OpenSession(cur.sessionSeq + 1, e.tsMicros, e.tsMicros, 1L, e.value)
      } else {
        // min/max: a late (cross-batch, within-watermark) event must
        // extend the session bounds, never regress them
        cur = cur.copy(
          startMicros = math.min(cur.startMicros, e.tsMicros),
          lastMicros = math.max(cur.lastMicros, e.tsMicros),
          nEvents = cur.nEvents + 1,
          sumValue = cur.sumValue + e.value)
      }
    }
    state.update(cur)
    out.iterator
  }

  /** events stream (ts TIMESTAMP) -> closed sessions per user. */
  def sessionize(spark: SparkSession, events: Dataset[org.apache.spark.sql.Row]): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"), col("ts"),
        unix_micros(col("ts")).as("tsMicros"), col("value").cast("double"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** Gap fold + watermark-driven closure: an idle session is emitted
    * once event time passes lastTs + gap, without waiting for the
    * user's next event. Timeout closure equals gap closure in event
    * time as long as data is within the watermark, so emitted sessions
    * stay exactly the batch-twin sessions. */
  def updateUserWithTimeout(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val cur = state.get
      if (cur.nEvents > 0L) {
        // tombstone (nEvents = 0) preserves sessionSeq so the user's
        // next session continues the batch-consistent numbering; a TTL
        // timeout eventually drops dormant tombstones so state tracks
        // recently-active users, not every user ever seen (a user
        // returning after the TTL restarts numbering at 1 — the
        // documented divergence from an all-history batch recompute)
        state.update(cur.copy(nEvents = 0L))
        state.setTimeoutTimestamp(cur.lastMicros / 1000 + TombstoneTtlMs)
        Iterator(ClosedSession(userId, cur.sessionSeq, cur.nEvents,
          cur.startMicros, cur.lastMicros, cur.sumValue))
      } else {
        state.remove() // TTL expired tombstone
        Iterator.empty
      }
    } else {
      val out = updateUser(userId, events, state)
      state.getOption.filter(_.nEvents > 0L).foreach { cur =>
        // round UP to ms: flooring would arm the timeout up to 999us
        // early, racing an exactly-on-gap-boundary event that must merge
        state.setTimeoutTimestamp((cur.lastMicros + GapMicros + 999) / 1000)
      }
      out
    }
  }

  /** Sessionize with event-time-timeout closure (requires a watermark on ts). */
  def sessionizeWithTimeout(spark: SparkSession, events: Dataset[org.apache.spark.sql.Row]): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id").cast("long"), col("event_id").cast("long"), col("ts"),
        unix_micros(col("ts")).as("tsMicros"), col("value").cast("double"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUserWithTimeout)
  }
}
