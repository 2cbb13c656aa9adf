package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Session-path extraction — "what do users actually do in one sitting":
  * gap-rule sessionization followed by the ordered event-type journey of
  * each session, the input to path-frequency and drop-off analysis (the
  * exploratory complement of the fixed-stage funnel operator).
  *
  * Sessionization is the portable two-window formulation the engine's
  * session-window twin (q26) established: flag gap > gapNs, running-sum
  * the flags into per-entity session ordinals. Both windows partition by
  * the entity key and sort (ts, tie) — per-entity-sized sorts, never a
  * global one.
  *
  * The path itself is assembled IN-ROW: collect_list gathers each
  * session's (ts, tie, type) structs (collect order is partition-
  * nondeterministic), then sort_array imposes the total (ts, tie) order
  * lexicographically and a transform projects the types — so the join
  * of types is deterministic without a second windowed pass over the
  * event stream. Per-session state is the session's own events, the
  * same bound any per-session analysis carries.
  */
object SessionPaths {

  /** Events + session ordinal `sid` per entity (gap rule: a new session
    * starts when the entity's gap since its previous event exceeds
    * `gapNs`; ties broken by `tieCol` for a total order). */
  def sessions(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, gapNs: Long): DataFrame = {
    val w1 = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__new_s",
        when(col(tsCol) - lag(col(tsCol), 1).over(w1) > gapNs, 1).otherwise(0))
      .withColumn("sid", sum(col("__new_s"))
        .over(w1.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .drop("__new_s")
  }

  /** One row per session: (entity, sid, n_events, path) with path =
    * the session's event types joined by `sep` in (ts, tie) order. */
  def paths(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapNs: Long,
      sep: String = ">"): DataFrame =
    sessions(events, entityCol, tsCol, tieCol, gapNs)
      .groupBy(col(entityCol), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            sort_array(collect_list(
              struct(col(tsCol).as("t"), col(tieCol).as("i"),
                col(typeCol).as("ty")))),
            x => x.getField("ty")),
          sep).as("path"))

  /** The top-k most frequent session paths: (path, n_sessions),
    * ordered by (count desc, path) for a deterministic cut. */
  def topPaths(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapNs: Long, k: Int): DataFrame =
    paths(events, entityCol, tsCol, tieCol, typeCol, gapNs)
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
}
