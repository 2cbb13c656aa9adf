package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same
  * key and right.time <= left.time (the time-series point-in-time
  * lookup — SURVEY.md B10 generalized into a reusable operator).
  *
  * Formulation: union both sides tagged, one window pass per key
  * carrying the last-seen right payload (`last(..., ignoreNulls)` over
  * rows-unbounded-preceding..current). Right rows at an equal timestamp
  * sort BEFORE left rows, so `<=` semantics hold. Cost: ONE shuffle on
  * the key (same as any join) + a per-key sort — no range explosion, no
  * per-left-row scan; this is the plan that survives 100 TB, vs the
  * naive `left.time >= right.time` theta-join whose output explodes
  * quadratically per key before aggregation.
  */
object AsOfJoin {

  /** @param pick right columns carried into the result (as a struct
    *   column named `asOf`, null when no prior right row exists). */
  def lastPrior(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: Seq[String],
      asOf: String = "asOf"): DataFrame = {
    val r2 = right.select(
      col(key).as("__k"), col(rightTime).as("__ts"),
      lit(0).as("__side"), struct(pick.map(col): _*).as("__r"))
    val l2 = left
      .withColumn("__k", col(key)).withColumn("__ts", col(leftTime))
      .withColumn("__side", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(asOf, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) :+ col(asOf): _*)
  }
}
