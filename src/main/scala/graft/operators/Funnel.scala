package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — "of the users who did A, how many later
  * did B, and later still C": the product-analytics staple over an
  * event stream. Stage i is reached at the entity's EARLIEST event of
  * stage i's type strictly after its stage i−1 time (strict temporal
  * order, not mere co-occurrence — a purchase before the first view
  * does not convert the view).
  *
  * Shape: one aggregation per stage over the entity key — min(CASE) with
  * the prior stage's time as the per-row threshold — composed left to
  * right. Every shuffle in the chain hashes the SAME entity key, so a
  * real cluster runs stage k's aggregation on the partitioning stage
  * k−1 already produced (Spark's ReusedExchange / co-partitioned join;
  * no re-shuffle of the event stream per stage). Nothing is ever
  * windowed over the whole stream and no per-entity event list is
  * collected — state per entity is one timestamp per stage, so a
  * 100 TB event log funnels with |entities|·|stages| intermediate
  * cells.
  *
  * Null propagation does the funnel arithmetic: an unreached stage i−1
  * has t_{i−1} = NULL, so `ts > NULL` is NULL, the CASE yields no
  * value, and min() leaves stage i NULL too — unreached stages stay
  * unreached without special-casing.
  */
object Funnel {

  /** Per-entity stage-completion times: (entity, t0 … t_{n−1}), one row
    * per entity that has any event; t_i is NULL where the funnel broke.
    *
    * r11: the per-stage joins read a SLIM stream pre-filtered to the
    * stage types and materialized once (eager localCheckpoint) — stage
    * k's join probes only type-s_k rows instead of re-scanning the
    * whole event log per stage (measured 10×-corpus: most events are
    * not stage types, so each of the k passes dropped to the stage
    * slice). The ENTITY UNIVERSE still comes from the full stream
    * (n_entities counts everyone with any event — unchanged answer). */
  def stageTimes(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val base = events.select(col(entityCol).as("__e"), col(tsCol).as("__ts"),
      col(typeCol).as("__ty"))
    // NULL entities drop explicitly (review fix): the old full-stream
    // INNER join dropped them implicitly (NULL keys never match); the
    // slim-stream LEFT join would carry an all-NULL-stage row through
    // and inflate n_entities by one.
    // r14: stage 0 folds into the entity-universe aggregation — one
    // groupBy(__e) over the full stream yields every entity AND its
    // min stage-0 time (stage 0 has no prior-stage threshold, so no
    // join is needed for it); the old shape paid a distinct + a join +
    // an aggregation for the same rows. Stages 1..k chain as before.
    val acc0 = base.filter(col("__e").isNotNull)
      .groupBy(col("__e"))
      .agg(min(when(col("__ty") === stages.head, col("__ts"))).as("t0"))
    val slim = base.filter(col("__ty").isin(stages.drop(1): _*))
      .localCheckpoint(true) // consumed once per stage below
    stages.zipWithIndex.drop(1).foldLeft(acc0) {
      case (acc, (st, i)) =>
        val cond = col("__ty") === st && col("__ts") > col(s"t${i - 1}")
        // left join: an entity with no stage-type events must keep its
        // row (all-NULL stages), exactly as the full-stream inner join
        // against `base` used to provide via its non-stage rows
        acc.join(slim.filter(col("__ty") === st), Seq("__e"), "left")
          .groupBy(col("__e") +: (0 until i).map(k => col(s"t$k")): _*)
          .agg(min(when(cond, col("__ts"))).as(s"t$i"))
    }.withColumnRenamed("__e", entityCol)
  }

  /** The funnel report: one row — total entities plus how many reached
    * each stage (a COUNT of non-null t_i; count columns are named after
    * the stages). */
  def report(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    stageTimes(events, entityCol, tsCol, typeCol, stages)
      .agg(count(lit(1)).as("n_entities"),
        stages.zipWithIndex.map { case (st, i) =>
          count(col(s"t$i")).as(s"n_$st")
        }: _*)
}
