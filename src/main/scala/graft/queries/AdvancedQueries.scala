package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Canon, Tables}
import Canon._

/** Catalog extension (round 2): sliding event-time windows, CUBE
  * grouping, the full analytic-window function set, and deterministic
  * stratified sampling. All stock Spark operators — the point is
  * coverage of the declared surface (SURVEY.md B14/B16/B17/B25) with
  * engine-portable renderings.
  */
object AdvancedQueries extends QueryGroup {

  private val TS = "'%Y-%m-%d %H:%M:%S'"
  private val P = 1000000007L

  /** Portable per-row sample hash (same LCG family as q46's split). */
  private def sampleHash(c: Column): Column =
    ((c % P) * 40503L + 17L) % P

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B25 widened: sliding (hopping) window — 1 h length, 15 min hop;
    // every event lands in exactly 4 windows. Streaming form is the
    // same groupBy(window(...)) with a watermark; Spark expands the
    // window set narrowly before the one aggregation shuffle.
    "q53_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts_t"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(tss(col("w.start")).as("win_start"), col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))),

    // B14 widened: CUBE over (status, priority) — all four grouping sets
    // in one pass (Spark expands to a single Expand + hash aggregate; no
    // multi-scan union). GROUPING() flags disambiguate NULL-as-total.
    "q54_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          count(lit(1)).as("n"),
          decD(sum(decFix(col("o_totalprice"), 2))).as("sum_price"))
        .select(col("g_status"), col("g_prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("g_status"), col("g_prio"), col("status"), col("priority"))),

    // B16/B17 widened: the full analytic set in one window —
    // ntile / percent_rank / cume_dist / lag / lead / first_value —
    // over a deterministic total order (price, then key; no ties).
    // Ratios are exact rationals of row counts → ratio1e4 render.
    "q55_window_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          ratio1e4(percent_rank().over(w)).as("pr_1e4"),
          ratio1e4(cume_dist().over(w)).as("cd_1e4"),
          coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)).as("prev_key"),
          coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_key"),
          first_value(col("o_orderkey")).over(w).as("cheapest_key"))
        .orderBy(col("o_orderpriority"), col("pr_1e4"), col("o_orderkey"))
    }),

    // Deterministic stratified sampling: exactly k rows per stratum,
    // chosen by portable hash order — reproducible across engines, runs
    // and cluster sizes (no RNG, no sampleBy approximation). The window
    // sorts only within each stratum; at 100 TB the same k-per-stratum
    // sample is a per-partition top-k (takeOrdered shape) instead of a
    // full sort — identical output, bounded memory.
    "q58_stratified_sample" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("h"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("h", sampleHash(col("o_orderkey")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 200)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_sampled"),
          decD(sum(decFix(col("o_totalprice"), 2))).as("sum_price"),
          min(col("h")).as("min_h"))
        .orderBy(col("o_orderpriority"))
    }),

    // Salted skew join as a declared query: orders⋈customer through
    // SkewJoin.saltedInner (left rows scatter across 4 salt buckets by a
    // deterministic per-row hash, the dim side replicates 4×), then a
    // mktsegment rollup. Result is provably identical to the plain
    // equi-join — the oracle twin IS the plain join, so the gate
    // hash-verifies the salting's correctness each round. This is the
    // explicit pre-split path for keys KNOWN hot at 100 TB (null-key /
    // celebrity-entity skew); AQE skew-join covers the detected-at-
    // runtime case.
    "q65_skew_salted" -> ((s, d) => {
      val j = graft.operators.SkewJoin.saltedInner(
        Tables.orders(s, d), "o_custkey", col("o_orderkey"),
        Tables.customer(s, d), "c_custkey", 4)
      j.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          decD(sum(decFix(col("o_totalprice"), 2))).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q53_sliding_window" ->
      s"""WITH k AS (SELECT unnest(range(0, 4)) AS k),
         |w AS (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |               - k.k * INTERVAL '15 minutes' AS win_start,
         |             event_type
         |      FROM events, k)
         |SELECT strftime(win_start, $TS) AS win_start, event_type, COUNT(*) AS n
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q54_cube" ->
      """SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |       COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q55_window_analytics" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(floor(percent_rank() OVER w * 10000 + 0.5) AS BIGINT) AS pr_1e4,
        |  CAST(floor(cume_dist() OVER w * 10000 + 0.5) AS BIGINT) AS cd_1e4,
        |  COALESCE(LAG(o_orderkey, 1) OVER w, -1) AS prev_key,
        |  COALESCE(LEAD(o_orderkey, 1) OVER w, -1) AS next_key,
        |  FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
        |FROM orders
        |WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, pr_1e4, o_orderkey""".stripMargin,

    "q58_stratified_sample" ->
      """WITH h AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |                  ((o_orderkey % 1000000007) * 40503 + 17) % 1000000007 AS h
        |           FROM orders),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                                   ORDER BY h, o_orderkey) AS rn
        |      FROM h)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price,
        |       CAST(MIN(h) AS BIGINT) AS min_h
        |FROM r WHERE rn <= 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q65_skew_salted" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
