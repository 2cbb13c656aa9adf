package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Continuously-maintained bottom-k quantile sketch — the streaming
  * twin of `QuantileSketch` (q142): the same k-minima-by-hash-priority
  * structure, kept in per-group state and re-emitted as it absorbs
  * each micro-batch.
  *
  * Why the parity is EXACT and not just convergent: min-k under a
  * fixed total order is associative, commutative, and idempotent (the
  * merge law QuantileSketchSpec pins in batch), so the state after ANY
  * partitioning of the input into micro-batches, in ANY arrival order,
  * equals the batch sketch of the union — StreamingSketchSpec feeds
  * shuffled multi-batch input and asserts bit-equality against
  * `QuantileSketch.bottomK`. No watermark is needed for correctness
  * (the sketch is order-free); state per group is k items, constant
  * forever.
  *
  * Emission contract (Update mode): after every micro-batch, each
  * TOUCHED group emits one row carrying its full current sketch and a
  * monotone `upd` counter — downstream reads the max-`upd` row per
  * group as "the sketch now" (the memory/console sinks accumulate
  * update-mode output, so the counter disambiguates).
  *
  * PRECONDITION (r11 ADVICE): `key` must uniquely identify a logical
  * row within its group. The state merge absorbs at-least-once
  * redelivery by dropping exact (priority, value, key) repeats — under
  * unique keys a repeat can ONLY be a replay, so stream ≡ batch holds
  * exactly. A multiset input (two genuine rows with the same key and
  * value) is indistinguishable from a replay and would collapse to one
  * rank slot where batch `QuantileSketch.bottomK` keeps two; feed such
  * inputs a row-unique key (e.g. source offset). The detectable half
  * of a violation — same key, different value — fails loudly below.
  */
object StreamingSketch {

  /** `key` MUST be row-unique within `g` (see object scaladoc). */
  case class SkIn(g: String, value: Long, key: String)
  case class SkState(items: List[(Long, Long, String)], upd: Long)
  case class SkOut(g: String, n_kept: Long, vals: Seq[Long], upd: Long)

  /** The exact priority `QuantileSketch.priority` computes in the plan:
    * fmix64(fnv1a64(key)) with the sign bit flipped (unsigned order on
    * a signed long). */
  def priorityOf(key: String): Long =
    graft.functions.Fnv1aHash.fmix64Impl(
      graft.functions.Fnv1aHash.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(key))) ^
      Long.MinValue

  def bottomK(spark: SparkSession, in: Dataset[SkIn], k: Int): Dataset[SkOut] = {
    import spark.implicits._
    require(k >= 1, s"k=$k must be >= 1")
    in.groupByKey(_.g)
      .flatMapGroupsWithState[SkState, SkOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[SkIn], state) =>
          val prev = state.getOption.getOrElse(SkState(Nil, 0L))
          val fresh = rows.map(r => (priorityOf(r.key), r.value, r.key))
          // merge + re-prune: the associative min-k law
          val merged = (prev.items ++ fresh)
            .distinct // replays are exact repeats under the unique-key
            .sortBy(identity) // precondition — dropping them is the
            .take(k) // idempotence law StreamingSketchSpec pins
          // enforce the detectable precondition violation: one key,
          // two values can never be a replay (k-sized check)
          require(merged.iterator.map(_._3).toSet.size == merged.size,
            s"StreamingSketch group '$g': duplicate key with differing " +
              "values in the kept set — SkIn.key must be row-unique")
          val st = SkState(merged, prev.upd + 1)
          state.update(st)
          Iterator.single(SkOut(g, merged.size.toLong,
            merged.map(_._2).sorted, st.upd))
      }
  }
}
