package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}

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
  *     time slice — and sorted WITHIN each partition (local sort, no
  *     further exchange);
  *  2. each partition folds its slice in ONE streaming mapPartitions
  *     pass to a single summary row: the peak local running sum with
  *     its earliest instant, and the slice's delta total. (This is the
  *     legitimate mapPartitions case — a per-partition imperative fold
  *     whose window formulation forces an extra hash(pid) exchange,
  *     because Catalyst cannot know that spark_partition_id IS the
  *     partitioning: measured r10, the fold is 0.31 s vs 0.45 s for
  *     the window form on the same 190 k deltas, SweepProbe);
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
    val spark = intervals.sparkSession
    import spark.implicits._
    val n = spark.sparkContext.defaultParallelism
    // ONE full-data pass: range exchange + in-partition sort, then the
    // imperative slice fold — peak local run with its EARLIEST instant
    // (strictly-greater update keeps the first t at the peak; the
    // offset is constant inside a slice, so the global peak within a
    // slice sits exactly at its local-run peak) plus the slice's delta
    // total. Each slice emits exactly one summary row; the pid only
    // needs to be consistent within this single evaluation, and the
    // eager ≤ n-row checkpoint pins the summaries for their two
    // consumers below.
    val loc = deltas.repartitionByRange(n, col("t"), col("d"))
      .sortWithinPartitions(col("t"), col("d"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var run = 0L; var best = Long.MinValue; var bestT = 0L
        var any = false
        for ((t, d) <- it) {
          any = true; run += d
          if (run > best) { best = run; bestT = t }
        }
        if (any) Iterator((pid, best, -bestT, run)) else Iterator.empty
      }
      .toDF("pid", "run", "nt", "tot")
      .localCheckpoint(true) // ≤ n rows, consumed twice below
    val offs = loc.select(col("pid"))
      .join(loc.select(col("pid").as("p2"), col("tot")),
        col("p2") < col("pid"), "left")
      .groupBy(col("pid")).agg(coalesce(sum(col("tot")), lit(0L)).as("off"))
    // global peak = max over slices of (offset + local peak); earliest
    // instant = min t among slices achieving it (each slice summary
    // already carries ITS earliest peak instant, encoded as −t)
    loc.join(offs, Seq("pid"))
      .select((col("run") + col("off")).as("active"), col("nt"))
      .agg(max(struct(col("active"), col("nt"))).as("s"))
      .select(col("s.active").as("max_concurrent"), (-col("s.nt")).as("at_t"))
      // empty input: a global agg emits one all-NULL row; the
      // join-based r9 formulation returned zero rows — keep that
      // contract (r10 review fix)
      .filter(col("max_concurrent").isNotNull)
  }
}
