package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Project, Repartition, Sort}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 removed the public
  * `new Column(expr)` constructor (Column lives in sql-api and wraps a
  * ColumnNode); the supported conversion lives in the private[sql]
  * `org.apache.spark.sql.classic.ExpressionUtils`. This is the standard
  * extension-library shim: a tiny accessor compiled into the spark.sql
  * package namespace. No Spark internals are reimplemented here.
  */
object Bridge {
  /** Public re-export of the private[sql] analyzer input-type contract,
    * so graft's native Expressions can declare `inputTypes` (implicit
    * cast insertion / clean analysis errors) from outside the sql
    * package. */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame — the input shape subquery
    * expressions (e.g. a ScalarSubquery carrying a sketch aggregate)
    * are built from. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Rewrite a result-rendering global sort (the determinism protocol's
    * trailing ORDER BY) into shuffle-to-one-partition + local sort: the
    * same total order without RangePartitioning's extra row-sampling
    * job per execution. Declared results are small (bounded row counts
    * by construction), so the single output partition is free; a sort
    * feeding a LIMIT keeps its shape (root is Limit, not Sort) and still
    * becomes TakeOrderedAndProject. Harness-side only — library callers
    * keep the plain global sort, which scales out. */
  def renderSort(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val rewritten = classic.queryExecution.logical match {
      case Sort(order, true, child, hint) =>
        Some(Sort(order, global = false, Repartition(1, shuffle = true, child), hint))
      case Project(list, Sort(order, true, child, hint)) =>
        Some(Project(list,
          Sort(order, global = false, Repartition(1, shuffle = true, child), hint)))
      case _ => None
    }
    rewritten
      .map(p => org.apache.spark.sql.classic.Dataset.ofRows(spark, p): DataFrame)
      .getOrElse(df)
  }

  /** Register a function builder on an ALREADY-RUNNING session's
    * registry — the post-hoc twin of SparkSessionExtensions
    * .injectFunction for sessions the caller didn't build (notebooks,
    * shared test sessions). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
