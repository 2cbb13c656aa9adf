package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream time-interval joins — the continuous form of q61's
  * click↔purchase attribution: two live event feeds correlated within a
  * bounded event-time window, the join a CDC-fed real-time pipeline
  * runs between its own topics (e.g. binlog order events against
  * binlog payment events).
  *
  * Semantics & state bounds (Structured Streaming's native
  * stream-stream join): both sides carry a watermark, and the join
  * condition bounds each side's event time against the other
  * (`right.ts ∈ [left.ts, left.ts + within)`), so the state store
  * retains only rows inside watermark ± within — state is
  * WINDOW-bounded, never history-bounded, the property that keeps a
  * 100 TB/day feed joinable forever. Inner results emit as soon as
  * both sides arrive; LEFT-OUTER unmatched rows emit once the
  * watermark proves no match can still arrive (null-padded), which is
  * exactly the attribution "view that never converted" record.
  *
  * Column contract: `left`/`right` need (`user_id`, `ts` timestamp,
  * `event_id`); output prefixes are `l_`/`r_`. StreamStreamJoinSpec
  * pins stream ≡ batch on shuffled arrival for inner, and the
  * emit-on-watermark + null-padding contract for left-outer.
  */
object StreamingJoin {

  private def sides(left: DataFrame, right: DataFrame, wmDelay: String) = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_event")).withWatermark("l_ts", wmDelay)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_event")).withWatermark("r_ts", wmDelay)
    (l, r)
  }

  private def cond(withinSec: Long) =
    col("l_user") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") < col("l_ts") + expr(s"INTERVAL $withinSec SECONDS")

  /** Inner: every (left, right) pair with the right event inside
    * [l_ts, l_ts + within). */
  def within(left: DataFrame, right: DataFrame, withinSec: Long,
      wmDelay: String): DataFrame = {
    val (l, r) = sides(left, right, wmDelay)
    l.join(r, cond(withinSec))
  }

  /** Left-outer: like [[within]], plus every left row that provably
    * (by watermark) never matched, null-padded — the "never converted"
    * record. */
  def withinLeftOuter(left: DataFrame, right: DataFrame, withinSec: Long,
      wmDelay: String): DataFrame = {
    val (l, r) = sides(left, right, wmDelay)
    l.join(r, cond(withinSec), "left_outer")
  }
}
