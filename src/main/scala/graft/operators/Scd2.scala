package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder — the batch form of the
  * dimension-versioning a CDC consumer (the reference's webhook/PubSub
  * targets, `reference/internal/binwatch/blsenderwork/blsenderwork.go`)
  * materializes downstream: collapse an entity's change events into
  * effective-dated version rows (value, eff_from, eff_to, version).
  *
  * Scale shape: both windows partition by the ENTITY key, so every sort
  * is entity-history-sized (tens of rows), never global — the plan is
  * two WindowExecs over one exchange on the entity hash, reused by both
  * (same partitioning, Catalyst plans a single shuffle). No join, no
  * aggregation, no driver state; 100 TB of history shards cleanly by
  * entity.
  *
  * Semantics: events are ordered per entity by (time, tie) — the tie
  * column makes same-instant updates deterministic (the CDC ItemID
  * ordering rule, `blreaderwork.go:239-247`). A version row opens at
  * the first event whose value differs from the running value
  * (run-length collapse via lag), closes at the next version's open
  * instant (lead), and the current version carries a NULL eff_to.
  */
object Scd2 {

  /** @param df     change stream: one row per observed (entity, time, value)
    * @param entity grouping key column name
    * @param time   event-time column (any orderable type; emitted as-is)
    * @param tie    unique-per-entity tiebreak column for same-instant rows
    * @param value  the tracked attribute
    * @return (entity, value, version, eff_from, eff_to) — version is
    *         1-based per entity in time order; eff_to NULL = current
    */
  def build(df: DataFrame, entity: String, time: String, tie: String,
      value: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(time), col(tie))
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(value), 1).over(w))
      // The first event per entity always opens version 1 — marked
      // explicitly by row_number, because lag() is NULL both for "no
      // previous row" and "previous value was NULL", and a NULL value
      // is a legal tracked state. Later rows open a version on any
      // NULL-safe change of the tracked value.
      .filter(col("__rn") === 1 || !(col(value) <=> col("__prev")))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("eff_from", col(time))
      .withColumn("eff_to", lead(col(time), 1).over(w))
      .select(col(entity), col(value), col("version"),
        col("eff_from"), col("eff_to"))
  }

  /** Point-in-time lookup over a built SCD2 table: the version row
    * effective at `at` (eff_from <= at < eff_to, NULL eff_to = open).
    * A plain filter — partition-prunable when the dimension is stored
    * partitioned/z-ordered by entity. */
  def asOf(scd2: DataFrame, at: Column): DataFrame =
    scd2.filter(col("eff_from") <= at &&
      (col("eff_to").isNull || col("eff_to") > at))

  /** Point-in-time join for the case where the FACT stream and the
    * change stream are the same rows (each event both opens/extends a
    * version and is itself a fact to stamp): returns `df` with the
    * `version` and tracked value of the [[build]] row effective at the
    * fact's own instant — without building the dimension or joining.
    *
    * Identity (window form of `facts ⋈ build(df)` on
    * `eff_from <= f_t AND (eff_to IS NULL OR eff_to > f_t)`): versions
    * of one entity are ordered by (time, tie) with eff_to_v =
    * eff_from_{v+1}, so the end-exclusive interval containing f_t is
    * exactly the LAST change row with time <= f_t —
    * max{v : t_v <= f_t}. (⇐: maximality gives t_{v+1} > f_t or v
    * open; ⇒: any earlier v has t_{v+1} <= f_t, any later has
    * t_v > f_t. A zero-width version has t_{v+1} = t_v <= f_t so it is
    * never the max — the skip rule for same-instant changes falls out.)
    * Every fact's time >= its entity's first change time (that change
    * is the entity's (time,tie)-minimal row), so the max is never NULL.
    *
    * Plan shape: ONE exchange on the entity hash; the change-marking
    * window sorts by (entity, time, tie) and the effective-version
    * window's (entity, time) requirement is a prefix of that order, so
    * no second sort and no join — the hot-entity O(facts × versions)
    * sort-merge residual of the join form is structurally gone.
    * Peer semantics: the second window's default RANGE frame up to
    * CURRENT ROW includes same-instant peers, which is precisely the
    * eff_from <= f_t inclusivity.
    */
  def asOfSameSource(df: DataFrame, entity: String, time: String,
      tie: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(time), col(tie))
    val wt = Window.partitionBy(col(entity)).orderBy(col(time))
    val marked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(value), 1).over(w))
      .withColumn("__chg",
        col("__rn") === 1 || !(col(value) <=> col("__prev")))
      // running change count in (time, tie) order = the version a
      // change row opens; only consulted at change rows below
      .withColumn("__ver",
        sum(when(col("__chg"), 1L).otherwise(0L)).over(w))
    marked
      // last change at-or-before this fact's instant: max over the
      // default RANGE frame (peers included); struct orders by __ver
      // first and versions are distinct per entity, so the tracked
      // value rides along without influencing the max
      .withColumn("__eff",
        max(when(col("__chg"), struct(col("__ver"), col(value))))
          .over(wt))
      .withColumn("version", col("__eff.__ver"))
      .withColumn(value, col(s"__eff.$value"))
      .drop("__rn", "__prev", "__chg", "__ver", "__eff")
  }
}
