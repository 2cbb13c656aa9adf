package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-group co-occurrence pairs — the edge/market-basket builder
  * behind the co-purchase graph (Triangles, PageRank) and basket lift.
  *
  * The naive build is a fact-table SELF-JOIN on the group key: two
  * shuffles of the full table and a join whose output IS the pair
  * blow-up. This operator instead collapses each group to its sorted
  * DISTINCT item array (one aggregation, map-side combined) and
  * generates the C(k,2) pairs IN-ROW with array HOFs — the pair
  * fan-out is bounded by group size (order lines, basket size), and
  * the only wide op is the one groupBy. Measured at sf0.1: the lift
  * query dropped ~4× switching from the self-join form.
  *
  * The basket table is EAGERLY localCheckpointed (q32 contract) —
  * callers invariably feed it to several consumers (pair explode +
  * item frequencies + group count), and re-running the collect_set
  * aggregation per consumer is exactly the waste this operator exists
  * to remove.
  *
  * Measured dead end (sf0.1, basket-lift shape): fusing pairs + item
  * singles + a group-count marker into ONE explode/aggregation (so all
  * three statistics come from a single shuffle) ran 1.44 s → 1.88 s —
  * the ×1.6 exploded volume through the one aggregate costs more than
  * slicing the tiny checkpointed basket table three times. Multiple
  * cheap passes over cached blocks beat one heavier pass here.
  */
object CoOccur {

  /** (group, ps): each group's sorted distinct item array.
    * `materialize = true` (the default) eagerly localCheckpoints the
    * table for the multi-consumer case described above; pass false
    * when the baskets feed exactly ONE downstream consumer (e.g. a
    * pair explode whose own result is checkpointed) — there the extra
    * materialization job is pure overhead.
    *
    * The groupBy's exchange is widened explicitly to the session's
    * defaultParallelism (keyed repartition — same shuffle, wider
    * reduce): the collect_set aggregation is the compute-heavy stage
    * of every consumer, and letting it inherit a small
    * spark.sql.shuffle.partitions serializes it (measured r10, sf0.1:
    * 0.58 s at width 4 → 0.30 s at width 16, BasketProbe). The
    * checkpointed table then carries that width to every downstream
    * explode. */
  def baskets(df: DataFrame, groupCol: String, itemCol: String,
      materialize: Boolean = true): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val b = df.repartition(p, col(groupCol))
      .groupBy(col(groupCol).as("g"))
      .agg(sort_array(collect_set(col(itemCol))).as("ps"))
    if (materialize) b.localCheckpoint(true) else b
  }

  /** Apriori item pruning: drop items whose corpus support (number of
    * distinct groups containing them) is below `minSupport` BEFORE pair
    * generation. A pair's support is bounded by its rarer item's
    * support, so under a pair-support floor >= minSupport the surviving
    * pair set is IDENTICAL (CoOccurSpec pins pruned ≡ unpruned) while
    * the exploded pair volume shrinks at the source — the lever that
    * matters on long-tail item distributions, where most items are
    * seen once or twice and would otherwise still pay C(k,2) fan-out.
    * (On the TPC-H fixture it prunes nothing — every part is in ~30
    * orders, BasketProbe r10 — so q121 leaves it off; a real basket
    * corpus is exactly the opposite.)
    *
    * Cost shape: one extra aggregation over the exploded item stream
    * (support counts) + a broadcast semi-filter applied IN-ROW to the
    * basket arrays — no second shuffle of the baskets. */
  def pruneInfrequentItems(b: DataFrame, minSupport: Long): DataFrame = {
    val keep = b.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
      .agg(sort_array(collect_list(col("p"))).as("keepset"))
    b.crossJoin(broadcast(keep))
      .select(col("g"),
        filter(col("ps"), x => array_contains(col("keepset"), x)).as("ps"))
      .filter(size(col("ps")) >= 2)
  }

  /** One row per (group, unordered pair) occurrence: (a, b) with a < b
    * (guaranteed by the sorted array). Feed to distinct() for an edge
    * list or to groupBy(a, b).count() for pair support. */
  def pairsFromBaskets(b: DataFrame): DataFrame =
    b.select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> named_struct('a', x, 'b', y))))")).as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))

  /** PACKED pair stream: the same C(k,2) in-row generation emitting ONE
    * BIGINT `pk = a·2³² + b` per pair instead of a 2-field struct — the
    * hot-stage form when nearly every pair is UNIQUE and the aggregation
    * therefore shuffles the full pair stream (map-side combine buys
    * nothing): 8-byte primitive keys vs 16+-byte structs through the
    * exchange and the hash table. Measured at the 10× corpus (12 M
    * pairs, BasketProbe r11): 2.24 s vs 2.54 s for the struct form
    * including the unpack — below ~1 M pairs the difference is noise
    * (the r10 measurement), so [[pairsFromBaskets]] remains the default.
    * r12: the pair array now materializes through the NATIVE codegen
    * kernel [[graft.functions.PackedPairs]] (tight primitive double
    * loop, one flat long[] per basket) instead of the
    * flatten∘transform∘slice HOF chain — ~3× on the explode pass at the
    * 10× corpus; same id-range contract, enforced in the kernel
    * (thrown loudly per basket, never a corrupted key).
    * Unpack with `shiftright(pk, 32)` / `pk & 4294967295L`. */
  def packedPairsFromBaskets(b: DataFrame): DataFrame =
    b.select(explode(
      graft.functions.PackedPairs.packedPairs(col("ps"))).as("pk"))

  /** Convenience: pairs straight from the fact table. The basket stage
    * is NOT checkpointed here — this form has exactly one consumer by
    * construction; checkpoint downstream if the pair stream fans out. */
  def pairs(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    pairsFromBaskets(baskets(df, groupCol, itemCol, materialize = false))

}
