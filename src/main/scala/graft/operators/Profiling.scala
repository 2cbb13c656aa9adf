package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-output data profiling (the ANALYZE/quality-gate pass a
  * training pipeline runs before using a table): per-column row,
  * non-null, exact-distinct counts and min/max, as one row per profiled
  * column `(col_name, n_rows, n_nonnull, n_distinct, min_d, max_d)`.
  *
  * Two physical forms with one cost gate (the q76 lesson — ship the
  * scale plan AND the small plan, pick by measured input size):
  *
  *  - [[profileOnePass]]: ONE scan of the table; the multiple exact
  *    count-distincts compile to Spark's Expand (k× row multiplication,
  *    each copy keeping one column) + partial dedup before the shuffle.
  *    At 100 TB one pass over the fact table beats anything that scans
  *    per column — the Expand rows are narrow (value + group id), and
  *    partial aggregation collapses them to per-partition distincts.
  *
  *  - [[profilePerColumn]]: one tiny aggregate per column, unioned.
  *    Each scan prunes to a single column, so at small scale k cheap
  *    pruned scans beat hashing k× the row count through Expand —
  *    measured 3-4× faster at the bench fixture.
  *
  * [[profile]] picks by the optimizer's size estimate, same contract
  * and threshold family as `SketchFilter.bloomSemiAuto`: below
  * `onePassThresholdBytes` the per-column form, above it the one-pass
  * form. The estimate scales with the input, so the gate flips exactly
  * where the trade does.
  */
object Profiling {

  /** Columns are profiled as DOUBLE min/max (exact for integer and
    * decimal inputs — decimal→double is correctly rounded and
    * engine-portable); counts are BIGINT. */
  private def outRow(c: String) = struct(
    lit(c).as("col_name"),
    col("n_rows"),
    col(s"nn_$c").cast("long").as("n_nonnull"),
    col(s"nd_$c").cast("long").as("n_distinct"),
    col(s"mn_$c").as("min_d"),
    col(s"mx_$c").as("max_d"))

  /** One scan; multi-distinct via Expand. The 100 TB form. */
  def profileOnePass(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(explode(array(cols.map(outRow): _*)).as("p"))
      .select(col("p.*"))
  }

  /** One pruned-scan aggregate per column, unioned. The small form. */
  def profilePerColumn(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(count(lit(1)).as("n_rows"),
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("double").as(s"mn_$c"),
          max(col(c)).cast("double").as(s"mx_$c"))
        .select(outRow(c).as("p"))
        .select(col("p.*"))
    }.reduce(_ unionAll _)
  }

  /** Cost-gated entry: per-column scans below the threshold, the
    * one-pass Expand above it. The default threshold is overridable
    * via `spark.graft.profile.onePassMinBytes` (r12: A/B-able from a
    * bench run without a rebuild). */
  def profile(df: DataFrame, cols: Seq[String],
      onePassThresholdBytes: Long = 256L << 20): DataFrame = {
    val thr = df.sparkSession.conf
      .getOption("spark.graft.profile.onePassMinBytes")
      .map(_.toLong).getOrElse(onePassThresholdBytes)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(thr)) profilePerColumn(df, cols)
    else profileOnePass(df, cols)
  }
}
