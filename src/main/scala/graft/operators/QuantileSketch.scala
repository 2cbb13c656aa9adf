package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k hash-priority quantile sample — a MERGEABLE approximate
  * quantile sketch with deterministic, cross-engine-reproducible
  * contents.
  *
  * Idea (order statistics of a uniform sample, the KMV trick pointed at
  * quantiles): assign every row a pseudo-uniform 64-bit priority (a
  * full-avalanche hash of its unique key — fmix64∘fnv1a64, the q52/q126
  * pipeline), keep the k smallest priorities per group, and estimate
  * quantile p as the ⌈p·k⌉-th order statistic of the kept VALUES. The
  * kept set is a uniform-without-replacement sample, so the estimate
  * carries the classic rank error O(1/√k); unlike a reservoir the
  * contents are a pure function of the DATA (no RNG state, no visit
  * order), so two engines agree bit-for-bit and a re-run is identical.
  *
  * Merge law (what makes it a sketch, proven in QuantileSketchSpec):
  * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) — min-k by a
  * fixed total order is associative/commutative/idempotent, so
  * partition-wise sketches union and re-prune without ever seeing the
  * full data; a 100 TB scan ships k rows per group per partition, and
  * the plan below is exactly Spark's map-side WindowGroupLimit: the
  * top-k prune runs BEFORE the exchange (the q105 reservoir discipline),
  * so the shuffle is k-bounded per group per map task.
  *
  * Ties: the total order is (priority, value, key) — collisions in the
  * 64-bit priority (or equal values) cannot make the kept set depend on
  * arrival order.
  */
object QuantileSketch {

  /** Priority column: fmix64(fnv1a64(key)) — full-avalanche, so
    * sequential keys don't bias the low order statistics (the r10
    * SketchError KMV finding applies verbatim here) — with the SIGN
    * BIT FLIPPED, so ordering the signed long equals ordering the
    * 64-bit hash unsigned (what a HUGEINT oracle compares) while the
    * sort stays a radix-sortable LONG: the q52 DECIMAL(21,0) unsigned
    * view is oracle-exact too, but a decimal comparator in the
    * map-side top-k sort measured 3× slower at 600 k rows. */
  def priority(key: Column): Column =
    graft.functions.Fnv1aHash.fmix64(
      graft.functions.Fnv1aHash.fnv1a64(key))
      .bitwiseXOR(lit(Long.MinValue))

  /** Keep the k lowest-priority rows per group.
    * @return (groupCol, value, prio, key) — the mergeable sketch rows */
  def bottomK(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val prio = priority(col(keyCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(prio, col(valueCol), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col(valueCol).as("value"),
        prio.as("prio"), col(keyCol).as("key"))
  }

  /** [[bottomK]] over a PRE-COMPUTED priority column (r14): callers
    * that reuse one hashed pass for several consumers (q142 shares the
    * scan between the sketch and its exact twin) pass prio directly and
    * drop the key payload. Ties order by (prio, value) only — without
    * the key tiebreak the kept ROWS may differ under a 64-bit prio
    * collision at equal value, but the kept (group, value, prio)
    * MULTISET is identical (tied rows are indistinguishable in it), so
    * every downstream estimate is unchanged. */
  def bottomKPre(df: DataFrame, groupCol: String, valueCol: String,
      prioCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(prioCol), col(valueCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col(valueCol).as("value"),
        col(prioCol).as("prio"))
  }

  /** Quantile estimates from the sketch rows: per group, quantile p ≈
    * the ⌈p·n_kept⌉-th smallest kept value. */
  def estimates(sketch: DataFrame, groupCol: String,
      probs: Seq[(String, Double)]): DataFrame = {
    val base = sketch.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_kept"),
      array_sort(collect_list(col("value"))).as("vals"))
    val est = probs.map { case (name, p) =>
      element_at(col("vals"),
        ceil(lit(p) * col("n_kept")).cast("int")).as(name)
    }
    base.select(col(groupCol) +: col("n_kept") +: est: _*)
  }
}
