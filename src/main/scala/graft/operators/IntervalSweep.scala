package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}
import org.apache.spark.sql.expressions.Window

/** Interval sweep-line in two distributed phases — "how many intervals
  * are active at once, and when does the peak happen": the classic
  * capacity/concurrency question (concurrent sessions, overlapping
  * reservations, instantaneous connection count).
  *
  * The textbook sweep is a GLOBAL running sum over boundary events —
  * which on Spark would be a partition-less window: one task, the
  * anti-pattern the repo's GlobalOrder gate exists to flag. This
  * operator is the scale-correct decomposition of a global prefix sum:
  *
  *  1. boundary deltas (+1 at start, −1 at end) are RANGE-partitioned
  *     on the sweep order (t, d) — each partition owns a contiguous
  *     time slice;
  *  2. each partition computes its LOCAL running sum (a window
  *     partitioned by the slice id — parallel, slice-sized sorts) and
  *     reduces, in the SAME pass, to one summary row per slice: the
  *     peak local run with its earliest instant, and the delta total;
  *  3. the per-slice totals — one row per slice — turn into slice
  *     OFFSETS by a triangular self-join on the tiny summary table
  *     (≤ #partitions rows; no partition-less window anywhere); the
  *     global peak is then a one-row reduction over the offset-adjusted
  *     slice summaries.
  *
  * global_active(row) = local_running + offset(slice); the peak inside
  * a slice sits at its local-run peak because the offset is constant
  * there, so slice summaries suffice for the global answer. The result is
  * partitioning-INDEPENDENT: the running-value multiset over a total
  * order does not depend on where slice boundaries fall (equal
  * boundaries commute — two +1s at the same instant pass through the
  * same values in either order). End-exclusive semantics fall out of
  * the sort: d = −1 orders before +1 at an equal instant, so an
  * interval ending exactly when another starts never overlaps it.
  *
  * The only materialization is the ≤ #partitions-row slice-summary
  * table (consumed twice: offsets + final reduction); the full delta
  * stream flows through exactly one pass, so nothing full-sized is
  * checkpointed or re-evaluated.
  */
object IntervalSweep {

  /** One row: (max_concurrent, at_t) — the peak active-interval count
    * and the EARLIEST boundary instant achieving it. Intervals are
    * [startCol, endCol) over an integral time axis. */
  def maxConcurrent(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = intervals
      .select(col(startCol).cast("long").as("t"), lit(1L).as("d"))
      .unionAll(intervals
        .select(col(endCol).cast("long").as("t"), lit(-1L).as("d")))
    val n = intervals.sparkSession.sparkContext.defaultParallelism
    // No checkpoint on the ranged stream: since the local-sum window
    // and the per-slice reduction fused into ONE pass (below), the
    // slice id has exactly one consumer — it only needs to be
    // consistent within that single evaluation, which any evaluation
    // is. (The old two-consumer shape needed the eager checkpoint to
    // pin pid across re-evaluations.)
    val ranged = deltas.repartitionByRange(n, col("t"), col("d"))
      .withColumn("pid", spark_partition_id().cast("long"))
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // ONE full-data pass: the local running sum feeds straight into a
    // per-slice reduction — the slice's peak local run with its
    // EARLIEST instant (max of (run, −t): the offset is constant inside
    // a slice, so the global peak within a slice sits exactly at its
    // local-run peak) plus the slice's delta total. The groupBy shares
    // the window's hash partitioning on pid, so no second exchange; all
    // downstream work is over ≤ n slice-summary rows.
    val loc = ranged
      .withColumn("run", sum(col("d")).over(wLocal))
      .groupBy(col("pid"))
      .agg(max(struct(col("run"), (-col("t")).as("nt"))).as("m"),
        sum(col("d")).as("tot"))
      .localCheckpoint(true) // ≤ n rows, consumed twice below
    val offs = loc.select(col("pid"))
      .join(loc.select(col("pid").as("p2"), col("tot")),
        col("p2") < col("pid"), "left")
      .groupBy(col("pid")).agg(coalesce(sum(col("tot")), lit(0L)).as("off"))
    // global peak = max over slices of (offset + local peak); earliest
    // instant = min t among slices achieving it (each slice summary
    // already carries ITS earliest peak instant, encoded as max(−t))
    loc.join(offs, Seq("pid"))
      .select((col("m.run") + col("off")).as("active"), col("m.nt").as("nt"))
      .agg(max(struct(col("active"), col("nt"))).as("s"))
      .select(col("s.active").as("max_concurrent"), (-col("s.nt")).as("at_t"))
  }
}
