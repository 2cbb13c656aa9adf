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

  /** Estimate the SOURCE partition count of a plan from metadata alone —
    * no physical planning, no RDD materialization (r7 advisory:
    * `df.rdd.getNumPartitions` whole-stage-COMPILES a physical plan the
    * caller may immediately discard for a repartitioned one). Handles
    * the shapes `Tables.spread` actually sees:
    *  - file-scan leaves: Spark's own split math over the already-listed
    *    FileIndex (`FilePartition.maxSplitBytes` + greedy packing
    *    approximated as ceil(Σ(len+openCost) / maxSplitBytes), exact to
    *    ±1 per bin boundary — plenty for a threshold decision);
    *  - materialized leaves (localCheckpoint → LogicalRDD): the existing
    *    RDD's count, no construction needed.
    * Plans with a shuffle between leaf and root, or other leaf kinds,
    * return None — the caller decides (spread falls back to the exact
    * physical count there). */
  def sourcePartitionEstimate(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Filter, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val conf = classic.sparkSession.sessionState.conf
    // Only narrow single-child nodes between root and leaf: anything
    // wide (join/agg/window/repartition) changes the partitioning and
    // the leaf count no longer describes the root.
    def leafOf(p: LogicalPlan): Option[LogicalPlan] = p match {
      case _: LogicalRelation | _: LogicalRDD => Some(p)
      case _: Filter | _: Project | _: SubqueryAlias => leafOf(p.children.head)
      case _ => None
    }
    leafOf(classic.queryExecution.optimizedPlan).flatMap {
      case r: LogicalRDD => Some(r.rdd.getNumPartitions.toLong)
      case l: LogicalRelation => l.relation match {
        // partitioned relations would need the pruning predicates applied
        // to the listing, and bucketed scans produce one partition per
        // bucket, not the split math — both fall back to the exact count
        case fs: HadoopFsRelation
            if fs.partitionSchema.nonEmpty || fs.bucketSpec.nonEmpty => None
        case fs: HadoopFsRelation =>
          val openCost = conf.filesOpenCostInBytes
          val maxBytes = conf.filesMaxPartitionBytes
          val minPart = conf.filesMinPartitionNum
            .getOrElse(classic.sparkSession.sparkContext.defaultParallelism)
          val lens = fs.location.listFiles(Nil, Nil).flatMap(_.files).map(_.getLen)
          if (lens.isEmpty) Some(0L)
          else {
            val total = lens.map(_ + openCost).sum
            val bytesPerCore = total / math.max(1, minPart)
            val maxSplit = math.min(maxBytes, math.max(openCost, bytesPerCore))
            Some(math.max(1L, (total + maxSplit - 1) / maxSplit))
          }
        case _ => None
      }
      case _ => None
    }
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
