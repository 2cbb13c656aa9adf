package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import java.sql.Timestamp

/** Custom-state streaming operators (SURVEY.md B26 widened): explicit
  * per-key state via flatMapGroupsWithState — the API for session logic
  * that `session_window` can't express (per-session event caps, custom
  * close conditions, emitting the session only when it closes).
  *
  * Scale shape: state lives in the state store, partitioned by key —
  * one entry per active session per user; event-time timeout expires
  * idle sessions as the watermark advances, so state is bounded by
  * active users, not history.
  */
object StatefulOps {

  case class Event(user_id: Long, ts: Timestamp)

  case class SessionState(start: Long, last: Long, n: Long)

  case class ClosedSession(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long)

  /** The Spark-4-native form of the sessionizer on the
    * `transformWithState` StatefulProcessor API (the successor to
    * flatMapGroupsWithState: typed per-key state handles + explicit
    * event-time TIMERS instead of a single timeout slot; requires the
    * RocksDB state store provider). Same interval-merge algebra and the
    * same emit-on-close contract as [[sessionize]] — the spec asserts
    * both implementations produce identical sessions. */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, ClosedSession] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[ClosedSession] = {
      val prev = if (session.exists()) Some(session.get()) else None
      val intervals =
        (prev.toSeq ++ rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)))
          .sortBy(s => (s.start, s.last))
      val merged = intervals.foldLeft(List.empty[SessionState]) { (acc, iv) =>
        acc match {
          case h :: tail if iv.start - h.last <= gapMs =>
            SessionState(h.start, math.max(h.last, iv.last), h.n + iv.n) :: tail
          case _ => iv :: acc
        }
      }
      val open = merged.head
      // one live timer per key: drop the previous close deadline
      prev.foreach(s => getHandle.deleteTimer(s.last + gapMs))
      session.update(open)
      getHandle.registerTimer(open.last + gapMs)
      merged.tail.reverseIterator.map(s =>
        ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!session.exists()) return Iterator.empty
      val s = session.get()
      if (info.getExpiryTimeInMs() >= s.last + gapMs) {
        session.clear()
        Iterator(ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
      } else Iterator.empty // stale timer from before the session extended
    }
  }

  /** [[sessionize]] on the transformWithState API — identical contract,
    * Spark-4-native state/timer machinery. */
  def sessionizeTws(spark: SparkSession, events: Dataset[Event],
      gapMs: Long, watermarkDelay: String): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Sessionize an event stream with an explicit gap: a session closes
    * when no event arrives for `gapMs` (enforced by event-time timeout
    * against the watermark). Emits one row per CLOSED session — the
    * streaming contract batch session windows can't give you. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long, watermarkDelay: String): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            // Gap-merge the open session with the batch as INTERVALS: an
            // out-of-order event more than gapMs before the open session's
            // start must form its own earlier session (session_window's
            // overlap rule), not stretch the open one backward.
            val intervals =
              (state.getOption.toSeq ++ rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)))
                .sortBy(s => (s.start, s.last))
            // fold ascending; head of acc is the latest merged interval
            val merged = intervals.foldLeft(List.empty[SessionState]) { (acc, iv) =>
              acc match {
                case h :: tail if iv.start - h.last <= gapMs =>
                  SessionState(h.start, math.max(h.last, iv.last), h.n + iv.n) :: tail
                case _ => iv :: acc
              }
            }
            val open = merged.head
            state.update(open)
            // close when the watermark passes last-event + gap
            state.setTimeoutTimestamp(open.last + gapMs)
            // everything except the latest interval can no longer grow
            // within this key's sorted timeline — emit as closed
            merged.tail.reverseIterator.map(s =>
              ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          }
      }
  }
}
