package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming CUSUM control chart — the continuously-running form of
  * [[graft.operators.Cusum.alarmsFixed]]: per-entity bucket counts
  * arrive as a stream, the chart statistic T advances by the textbook
  * recurrence T ← max(0, T + (x − μ)) against the FIXED reference μ,
  * and every bucket emits its (T, alarm) row exactly once.
  *
  * The recurrence is causal (T depends only on the prefix), so a row
  * is FINAL the moment its bucket is applied — the append-mode
  * contract — provided buckets apply in event-time order. The
  * processor therefore buffers arrivals until the WATERMARK passes
  * them and applies ripe buckets sorted by time (the
  * [[StatefulOps.funnelStages]] discipline): out-of-order arrival
  * across micro-batches cannot corrupt the running statistic, and the
  * spec pins stream ≡ batch on shuffled input.
  *
  * State per entity: one long (the running T) plus the in-flight
  * buffer (bounded by watermark delay × bucket rate) — bounded by live
  * entities, the correct 100 TB monitoring shape.
  */
object StreamingCusum {

  case class BucketCount(entity: Long, ts: Timestamp, n: Long)

  case class ChartRow(entity: Long, ts: Timestamp, t_stat: Long,
      alarm: Boolean)

  case class PendB(ts: Long, n: Long)

  case class ChartState(pending: List[PendB], t: Long)

  def chart(spark: SparkSession, buckets: Dataset[BucketCount],
      mu: Long, h: Long, watermarkDelay: String): Dataset[ChartRow] = {
    import spark.implicits._
    buckets
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.entity)
      .flatMapGroupsWithState[ChartState, ChartRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (entity: Long, rows: Iterator[BucketCount], state: GroupState[ChartState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(ChartState(Nil, 0L))
          val pending =
            if (state.hasTimedOut) prev.pending
            else prev.pending ++ rows
              .filter(_.ts.getTime >= wm)
              .map(b => PendB(b.ts.getTime, b.n))
          // strict boundary (the StreamingScd2 r10 review fix): ts == wm
          // is still admissible in later batches, so it must not
          // finalize until the watermark passes it
          val (ripe, hold) = pending.partition(_.ts < wm)
          var t = prev.t
          val emits = ripe.sortBy(_.ts).map { b =>
            t = math.max(0L, t + (b.n - mu))
            ChartRow(entity, new Timestamp(b.ts), t, t > h)
          }
          state.update(ChartState(hold, t))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.ts).min, wm + 1))
          emits.iterator
      }
  }
}
