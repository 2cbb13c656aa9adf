package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.B): one entry
  * per implemented operator; `oracleSql` holds the DuckDB twin for every
  * SQL-expressible entry (the t2 correctness gate hash-compares both over
  * the same parquet tables).
  */
object SparkEntry {
  private val groups: Seq[QueryGroup] =
    Seq(BatchQueries, StreamTwins, TextQueries, VectorQueries, DedupQueries,
      MultimodalQueries, FunctionQueries, PipelineQueries, StatQueries,
      AdvancedQueries, AnalyticsQueries, HistoryQueries, CurationQueries)

  /** Flagship query (TPC-H Q1 analog) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q11_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracle).toMap
}
