package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 removed the public
  * `new Column(expr)` constructor (Column lives in sql-api and wraps a
  * ColumnNode); the supported conversion lives in the private[sql]
  * `org.apache.spark.sql.classic.ExpressionUtils`. This is the standard
  * extension-library shim: a tiny accessor compiled into the spark.sql
  * package namespace. No Spark internals are reimplemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

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
