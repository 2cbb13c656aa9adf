package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM control chart (Page 1954) over per-entity count series — the
  * ONLINE complement of [[Changepoint]]: instead of retrospectively
  * locating the strongest split, accumulate positive deviation from a
  * reference level and ALARM when it crosses a threshold — the
  * monitoring chart a deployment watches, bucket by bucket.
  *
  * The textbook recurrence T_t = max(0, T_{t−1} + (x_t − μ)) is a scan,
  * not a window function — but it unrolls exactly:
  *     T_t = R_t − min(0, min_{j≤t} R_j),   R_t = Σ_{i≤t} (x_i − μ)
  * (prefix sum minus its own running minimum, floored at the initial
  * 0), so TWO windows over ONE entity-partitioned exchange compute it
  * — the q131 shape, no UDAF, no collect. To stay BIGINT-closed with a
  * rational reference μ = S_n/n, everything is scaled by n:
  * D_t = n·x_t − S_n, and the threshold is expressed in the same
  * n-scaled units.
  *
  * Scale shape: one groupBy to the bucket grain upstream, then windows
  * partitioned by the entity key — series-sized sorts, never global;
  * 100 TB of events collapse to |entities|·|buckets| rows first.
  */
object Cusum {

  /** Alarm summary per entity against the series' OWN mean (the
    * retrospective form — reference computed from the full series).
    * `hSnMultiple`: threshold h = hSnMultiple · S_n in the n-scaled
    * units (cumulative excess of hSnMultiple × the series mean).
    * @return (entity, n_alarms, first_alarm bucket or NULL, peak_t) */
  def alarmsRetro(counts: DataFrame, entity: String, bucket: String,
      n: String, hSnMultiple: Int = 4): DataFrame = {
    val wp = Window.partitionBy(col(entity)).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col(entity))
    val t = counts
      .select(col(entity), col(bucket), col(n).cast("long").as("__x"))
      .withColumn("__sn", sum(col("__x")).over(wt))
      .withColumn("__nn", count(lit(1)).over(wt))
      .withColumn("__r",
        sum(col("__nn") * col("__x") - col("__sn")).over(wp))
      .withColumn("__t",
        col("__r") - least(lit(0L), min(col("__r")).over(wp)))
      .withColumn("__h", lit(hSnMultiple.toLong) * col("__sn"))
    t.groupBy(col(entity))
      .agg(count(when(col("__t") > col("__h"), 1)).as("n_alarms"),
        min(when(col("__t") > col("__h"), col(bucket))).as("first_alarm"),
        max(col("__t")).as("peak_t"))
  }

  /** The same chart against a FIXED reference (the deployed online
    * form: μ and h come from history, not from the series being
    * watched) — x-scaled units, no n scaling needed. Causal: T_t
    * depends only on the prefix, which is what makes the streaming twin
    * ([[graft.streaming.StreamingCusum]]) emission-final. */
  def alarmsFixed(counts: DataFrame, entity: String, bucket: String,
      n: String, mu: Long, h: Long): DataFrame = {
    val wp = Window.partitionBy(col(entity)).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = counts
      .select(col(entity), col(bucket), col(n).cast("long").as("__x"))
      .withColumn("__r", sum(col("__x") - lit(mu)).over(wp))
      .withColumn("__t",
        col("__r") - least(lit(0L), min(col("__r")).over(wp)))
    t.select(col(entity), col(bucket), col("__t").as("t_stat"),
      (col("__t") > lit(h)).as("alarm"))
  }
}
