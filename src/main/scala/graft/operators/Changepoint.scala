package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline changepoint detection over per-entity count series — the
  * batch complement of the rolling anomaly gate (q120): instead of
  * flagging single outlier buckets, find WHERE the level of the series
  * shifted (deploy landed, feed died, traffic mix changed).
  *
  * Statistic: the CUSUM-style split score. For a series x_1..x_n with
  * prefix sums S_k and total S_n, the score of a split after bucket k is
  *     D_k = |n·S_k − k·S_n|
  * — n·|prefix mean − overall mean|·k, the unnormalized two-sample
  * drift between the head and the whole. The changepoint estimate is
  * argmax_k D_k (earliest k on ties). All of it is BIGINT-closed
  * integer algebra on counts — no float crosses engines, so the DuckDB
  * twin reproduces every D_k exactly.
  *
  * Scale shape: one groupBy to the bucket grain, then two windows BOTH
  * partitioned by the entity key (prefix walk + argmax rank) — sorts
  * are series-sized, never global, and Catalyst reuses one entity-hash
  * exchange. Nothing is driver-side; 100 TB of events collapse to
  * |entities|·|buckets| rows at the first aggregate.
  */
object Changepoint {

  /** @param counts  (entity, bucket, n) — one row per non-empty bucket
    * @return (entity, cp_bucket, d_stat, n_buckets): the bucket AFTER
    *         which the strongest level shift occurs, its D_k, and the
    *         series length. Entities with a single bucket report D=0.
    */
  def split(counts: DataFrame, entity: String, bucket: String,
      n: String): DataFrame = {
    val wp = Window.partitionBy(col(entity)).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col(entity))
    val scored = counts
      .select(col(entity), col(bucket), col(n).cast("long").as("__x"))
      .withColumn("__sk", sum(col("__x")).over(wp))
      .withColumn("__k", count(lit(1)).over(wp))
      .withColumn("__sn", sum(col("__x")).over(wt))
      .withColumn("__nn", count(lit(1)).over(wt))
      .withColumn("d_stat",
        abs(col("__nn") * col("__sk") - col("__k") * col("__sn")))
    val rank = Window.partitionBy(col(entity))
      .orderBy(col("d_stat").desc, col(bucket))
    scored
      .withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .select(col(entity), col(bucket).as("cp_bucket"), col("d_stat"),
        col("__nn").as("n_buckets"))
  }
}
