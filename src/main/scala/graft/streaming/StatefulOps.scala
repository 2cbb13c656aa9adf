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
  * one entry per PENDING session interval per user; event-time timers
  * expire intervals as the watermark advances, so state is bounded by
  * active users, not history.
  *
  * Emission contract (matches `session_window`'s emit-on-watermark): a
  * session row is emitted only once the WATERMARK passes its close
  * deadline (last event + gap), never merely because a later-timed
  * event arrived in the same batch — so a late-but-admissible event in
  * a later micro-batch that falls within the gap of a pending interval
  * extends (or bridges) it instead of finding it already emitted (the
  * r4 advisory's cross-batch out-of-order case).
  */
object StatefulOps {

  case class Event(user_id: Long, ts: Timestamp)

  case class SessionState(start: Long, last: Long, n: Long)

  /** All not-yet-emittable intervals of one key, ascending by start;
    * the last one is the open session. `armedAt` records the event-time
    * timer actually registered (which may be clamped past the raw min
    * deadline), so the next batch deletes the REAL timer — deleting a
    * recomputed deadline would miss a clamped registration and leak
    * timers. Used by the transformWithState form; −1 = none. */
  case class SessionBuf(intervals: List[SessionState], armedAt: Long = -1L)

  case class ClosedSession(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long)

  /** Gap-merge a batch of events into the pending intervals: an
    * out-of-order event more than gapMs before an interval's start
    * forms its own earlier interval (session_window's overlap rule) —
    * and one event can BRIDGE two pending intervals into one. */
  private def mergeIntervals(pending: Seq[SessionState], events: Seq[SessionState],
      gapMs: Long): List[SessionState] = {
    val intervals = (pending ++ events).sortBy(s => (s.start, s.last))
    intervals.foldLeft(List.empty[SessionState]) { (acc, iv) =>
      acc match {
        case h :: tail if iv.start - h.last <= gapMs =>
          SessionState(h.start, math.max(h.last, iv.last), h.n + iv.n) :: tail
        case _ => iv :: acc
      }
    }.reverse
  }

  /** An interval is safe to emit once no admissible event (ts >=
    * watermark) can still land within gapMs of its end. */
  private def ripe(s: SessionState, gapMs: Long, watermarkMs: Long): Boolean =
    s.last + gapMs < watermarkMs

  private def emit(user: Long, s: SessionState): ClosedSession =
    ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n)

  /** The Spark-4-native form of the sessionizer on the
    * `transformWithState` StatefulProcessor API (the successor to
    * flatMapGroupsWithState: typed per-key state handles + explicit
    * event-time TIMERS instead of a single timeout slot; requires the
    * RocksDB state store provider). Same interval algebra and the same
    * emit-on-watermark contract as [[sessionize]] — the spec asserts
    * both implementations produce identical sessions. */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, ClosedSession] {

    @transient private var buf: ValueState[SessionBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[SessionBuf]("sessions",
        Encoders.product[SessionBuf], TTLConfig.NONE)

    /** One live timer per key, at the earliest pending close deadline;
      * returns the registered timestamp (−1 if none) for the state. */
    private def rearm(prevArmed: Long, kept: List[SessionState],
        watermarkMs: Long): Long = {
      if (prevArmed >= 0) getHandle.deleteTimer(prevArmed)
      if (kept.isEmpty) -1L
      else {
        val t = math.max(kept.map(_.last + gapMs).min, watermarkMs + 1)
        getHandle.registerTimer(t)
        t
      }
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[ClosedSession] = {
      val prev = if (buf.exists()) buf.get() else SessionBuf(Nil)
      val wm = tv.getCurrentWatermarkInMs()
      val merged = mergeIntervals(prev.intervals,
        rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)).toSeq, gapMs)
      val (done, kept) = merged.partition(ripe(_, gapMs, wm))
      val armed = rearm(prev.armedAt, kept, wm)
      if (kept.isEmpty) buf.clear() else buf.update(SessionBuf(kept, armed))
      done.iterator.map(emit(user, _))
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!buf.exists()) return Iterator.empty
      val prev = buf.get()
      val wm = tv.getCurrentWatermarkInMs()
      val (done, kept) = prev.intervals.partition(ripe(_, gapMs, wm))
      // the FIRED timer is consumed by the runtime; a stale armed one
      // (from before a reschedule) still needs explicit deletion
      val stillArmed =
        if (prev.armedAt >= 0 && prev.armedAt != info.getExpiryTimeInMs()) prev.armedAt
        else -1L
      val armed = rearm(stillArmed, kept, wm)
      if (kept.isEmpty) buf.clear() else buf.update(SessionBuf(kept, armed))
      done.iterator.map(emit(user, _))
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

  case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)

  case class PendingEv(ts: Long, typ: String)

  /** Streaming funnel state: the monotone stage-completion vector
    * (−1 = unreached) plus the not-yet-admissible event buffer. */
  case class FunnelBuf(stageTimes: List[Long], pending: List[PendingEv])

  case class StageReached(user_id: Long, stage: Int, stage_name: String,
      at: Timestamp)

  /** Streaming twin of the batch `Funnel` operator (q114), with EXACT
    * batch parity under out-of-order arrival: stage i is reached at the
    * entity's earliest stages(i)-typed event STRICTLY after its stage
    * i−1 time — so a late-but-admissible early event must be allowed to
    * claim a stage before a later-timed event that arrived first. The
    * processor therefore buffers each user's events until the WATERMARK
    * passes them, then applies them in ascending event-time order to
    * the monotone stage vector; applying ripe events in ts order makes
    * "first qualifying event advances" identical to the batch
    * min(CASE) algebra. Emits one row per stage ADVANCE — each (user,
    * stage) appears at most once, when it becomes FINAL (no
    * retraction is ever needed, the append-mode contract).
    *
    * State per user is |stages| longs + the in-flight buffer (bounded
    * by the watermark delay × the user's event rate); state is
    * REMOVED once the funnel completes and the buffer drains — a
    * completed user costs nothing forever after. Event-time timers
    * drain buffers whose user receives no further events. */
  def funnelStages(spark: SparkSession, events: Dataset[TypedEvent],
      stages: Seq[String], watermarkDelay: String): Dataset[StageReached] = {
    import spark.implicits._
    val n = stages.size
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, StageReached](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[FunnelBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption
            .getOrElse(FunnelBuf(List.fill(n)(-1L), Nil))
          val pending =
            if (state.hasTimedOut) prev.pending
            else prev.pending ++ rows.map(e => PendingEv(e.ts.getTime, e.event_type))
          val (ripe, hold) = pending.partition(_.ts <= wm)
          var times = prev.stageTimes.toArray
          val emits = List.newBuilder[StageReached]
          for (e <- ripe.sortBy(_.ts)) {
            val k = times.indexOf(-1L)
            if (k >= 0 && e.typ == stages(k) &&
                (k == 0 || e.ts > times(k - 1))) {
              times(k) = e.ts
              emits += StageReached(user, k, stages(k), new Timestamp(e.ts))
            }
          }
          val complete = !times.contains(-1L)
          if (hold.isEmpty && complete) {
            if (state.exists) state.remove()
          } else {
            state.update(FunnelBuf(times.toList, hold))
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(math.max(hold.map(_.ts).min, wm + 1))
          }
          emits.result().iterator
      }
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
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val pending = state.getOption.map(_.intervals).getOrElse(Nil)
          val merged =
            if (state.hasTimedOut) pending
            else mergeIntervals(pending,
              rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)).toSeq, gapMs)
          val (done, kept) = merged.partition(ripe(_, gapMs, wm))
          if (kept.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBuf(kept))
            // wake when the earliest pending deadline passes the
            // watermark (must be strictly ahead of the current one)
            state.setTimeoutTimestamp(
              math.max(kept.map(_.last + gapMs).min, wm + 1))
          }
          done.iterator.map(emit(user, _))
      }
  }
}
