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
  *     partitioned by the slice id — parallel, slice-sized sorts);
  *  3. per-slice delta totals — one row per slice — turn into slice
  *     OFFSETS by a triangular self-join on the tiny totals table
  *     (≤ #partitions rows; no partition-less window anywhere), and
  *     a broadcast join adds each slice's offset to its local sums.
  *
  * global_active(row) = local_running + offset(slice). The result is
  * partitioning-INDEPENDENT: the running-value multiset over a total
  * order does not depend on where slice boundaries fall (equal
  * boundaries commute — two +1s at the same instant pass through the
  * same values in either order). End-exclusive semantics fall out of
  * the sort: d = −1 orders before +1 at an equal instant, so an
  * interval ending exactly when another starts never overlaps it.
  *
  * EAGER by documented contract (Triangles/q32 pattern): the ranged
  * delta stream is localCheckpointed because the slice id must be
  * STABLE across its two consumers (local sums + totals) — and the
  * boundaries of a re-evaluated range partitioning are not contractual.
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
    val ranged = deltas.repartitionByRange(n, col("t"), col("d"))
      .withColumn("pid", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("run", sum(col("d")).over(wLocal))
    val tots = ranged.groupBy(col("pid")).agg(sum(col("d")).as("tot"))
    val offs = tots.select(col("pid"))
      .join(tots.select(col("pid").as("p2"), col("tot")),
        col("p2") < col("pid"), "left")
      .groupBy(col("pid")).agg(coalesce(sum(col("tot")), lit(0L)).as("off"))
    val active = local.join(broadcast(offs), Seq("pid"))
      .select(col("t"), (col("run") + col("off")).as("active"))
    val mx = active.agg(max(col("active")).as("max_concurrent"))
    active.join(broadcast(mx), col("active") === col("max_concurrent"))
      .groupBy(col("max_concurrent")).agg(min(col("t")).as("at_t"))
  }
}
