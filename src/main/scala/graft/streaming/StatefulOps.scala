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
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // late out-of-order event may precede the open session's
                  // start — extend start backward, mirroring last forward
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last-event + gap
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
