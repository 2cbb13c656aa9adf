package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of declared queries plus their DuckDB oracle SQL twins.
  * Contract (SURVEY.md §2.B): for every key in `queries` that is
  * SQL-expressible, `oracle` holds ANSI SQL runnable by DuckDB over the
  * same parquet tables, producing identical column names / values under
  * the determinism protocol (Canon).
  */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
