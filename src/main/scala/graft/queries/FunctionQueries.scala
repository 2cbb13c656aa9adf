package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Aggregators, Fnv1aHash, NGrams}

/** Custom-function surface (SURVEY.md B13 approx / B31 UDF/UDAF/UDTF):
  * every extension mechanism exercised inside a declared query —
  * approx sketch (bench-only accuracy), custom Generator (oracle-exact),
  * typed Aggregator (oracle-exact), codegen'd custom Expression
  * (unit-tested for parity; FNV is not portably expressible in DuckDB's
  * overflow-checked BIGINT arithmetic, so its query is rows-only). */
object FunctionQueries extends QueryGroup {

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), x => x =!= "")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B13 approx variant: HLL sketch. No hash-comparable oracle by design
    // (rows-only check); the exact twin is q13. Accuracy asserted in
    // FunctionsSpec (±5% of exact).
    "q42_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))),

    // Custom Generator (UDTF): one-pass word trigrams.
    "q43_udtf_ngrams" -> ((s, d) =>
      Tables.documents(s, d)
        .select(NGrams.ngrams(toks(col("text")), 3).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)),

    // Typed Aggregator (UDAF): exact sum-of-squares (two-phase partial agg).
    "q44_udaf_sumsq" -> ((s, d) => {
      val sumsq = udaf(Aggregators.SumSq)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sumsq(col("l_quantity")).as("sumsq_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Codegen'd custom Expression in a real plan: FNV-1a shard buckets
    // over a composite key (rows-only; value parity covered by
    // FunctionsSpec against the scalar implementation).
    "q45_fnv_shard" -> ((s, d) =>
      Tables.orders(s, d)
        .select(pmod(Fnv1aHash.fnv1a64(concat_ws("-", col("o_custkey"), col("o_orderkey"))), lit(8))
          .cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")))
  )

  override def oracle: Map[String, String] = Map(
    "q43_udtf_ngrams" ->
      """WITH t AS (SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                              x -> x <> '') AS toks FROM documents)
        |SELECT ngram, COUNT(*) AS n FROM (
        |  SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS ngram
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 1))) u(i)) g
        |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

    "q44_udaf_sumsq" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
