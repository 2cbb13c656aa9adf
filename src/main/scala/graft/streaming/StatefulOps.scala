package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
