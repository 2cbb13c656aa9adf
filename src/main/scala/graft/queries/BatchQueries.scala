package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Canon, Tables}
import Canon._

/** Declared batch queries Q1–Q24 (SURVEY.md §2.B, B1–B24).
  *
  * Every builder is pure DataFrame API so Catalyst gets the full logical
  * plan: parquet filter/column pushdown (B1/B2), join strategy selection +
  * AQE (B3–B9), whole-stage codegen'd aggregates and windows (B11–B17).
  * Explicit `broadcast()` hints mark dimension tables that stay broadcast-
  * able at 100 TB fact scale (region/nation: fixed cardinality).
  */
object BatchQueries extends QueryGroup {

  private val TS = "'%Y-%m-%d %H:%M:%S'" // DuckDB strftime twin of Canon.tss

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1: bare parquet scan + count (metadata-only aggregate at scale).
    "q01_scan_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("cnt_all"))),

    // B2: projection + filter; predicate and 3-column ReadSchema reach the scan.
    "q02_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // B3: inner equi-join (shuffle join on o_custkey at scale; AQE may
    // broadcast customer at small SF).
    "q03_join_inner" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))),

    // B4: broadcast join of two small dims — no shuffle at any scale.
    "q04_join_broadcast" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))),

    // B5: left outer join; customers with zero orders.
    "q05_join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .filter(col("o_orderkey").isNull)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // B6: anti join — parts never ordered. l_partkey is non-null so
    // left_anti ≡ NOT IN.
    "q06_join_anti" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
        .limit(100)),

    // B7: full outer join of pre-aggregated per-nation counts (aggregate
    // before the join: shrinks both sides to |nation| rows at any scale).
    "q07_join_full_outer" -> ((s, d) => {
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("s_cnt"))
      val cus = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk2"))
        .agg(count(lit(1)).as("c_cnt"))
      sup.join(cus, col("nk") === col("nk2"), "full_outer")
        .select(
          coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("s_cnt"), lit(0L)).as("s_cnt"),
          coalesce(col("c_cnt"), lit(0L)).as("c_cnt"))
        .orderBy(col("nationkey"))
    }),

    // B8: cross/theta join (BroadcastNestedLoopJoin on a 5-row dim).
    "q08_join_cross" -> ((s, d) => {
      val r1 = Tables.region(s, d).select(col("r_regionkey").as("k1"), col("r_name").as("r1_name"))
      val r2 = Tables.region(s, d).select(col("r_regionkey").as("k2"), col("r_name").as("r2_name"))
      r1.crossJoin(broadcast(r2)).filter(col("k1") < col("k2"))
        .select(col("r1_name"), col("r2_name"))
        .orderBy(col("r1_name"), col("r2_name"))
    }),

    // B9: range (non-equi) join — orders against derived year buckets.
    // Equality pre-bucket + range verify: each fact row joins its
    // date_trunc key to the bucket start via a broadcast HASH join
    // (codegen O(1) probe), then the general range predicate verifies
    // membership — result-identical to the pure non-equi join but
    // without the BroadcastNestedLoopJoin's O(buckets) row-at-a-time
    // predicate sweep. At 100 TB the fact side still never shuffles;
    // for ranges that aren't truncation-aligned the same pattern
    // expands each row to its covering bucket keys first.
    "q09_join_range" -> ((s, d) => {
      val o = Tables.orders(s, d)
      // int year as the equality key: constraint propagation then infers
      // cheap int predicates into the scan instead of re-evaluating
      // date_trunc per row; y_start is derived ON THE TINY BUCKET SIDE
      // only (make_date(yr,1,1) ≡ date_trunc(year, ·) for ts in yr).
      val buckets = o.select(year(col("o_orderdate")).as("yr")).distinct()
        .select(col("yr"),
          make_date(col("yr"), lit(1), lit(1)).cast("timestamp_ntz").as("y_start"))
        .withColumn("y_end", add_months(col("y_start"), 12).cast("timestamp_ntz"))
      o.withColumn("yr", year(col("o_orderdate")))
        .join(broadcast(buckets), "yr")
        .filter(col("o_orderdate") >= col("y_start") && col("o_orderdate") < col("y_end"))
        .groupBy(col("y_start"))
        .agg(count(lit(1)).as("n_orders"),
          dec(sum(decFix(col("o_totalprice")))).cast("double").as("sum_price"))
        .select(tss(col("y_start")).as("y"), col("n_orders"), col("sum_price"))
        .orderBy(col("y"))
    }),

    // B10: as-of join via the window formulation — for each purchase, the
    // latest strictly-prior click of the same user. Partition-local window,
    // single shuffle on user_id.
    "q10_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("prior_click_ts",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), nsToStr(col("ts")).as("ts_s"),
          coalesce(nsToStr(col("prior_click_ts")), lit("none")).as("prior_click_s"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // B11: TPC-H Q1 pricing summary. Per-row arithmetic in DOUBLE (bit-
    // identical across engines), cast to DECIMAL(18,4) BEFORE the sum so
    // aggregation order can't flip a ulp (partial/final agg at scale);
    // the exact decimal totals render as DOUBLE (Canon.decD rationale).
    "q11_agg_pricing_summary" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp_ntz"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dec(sum(decFix(col("l_quantity")))).cast("double").as("sum_qty"),
          dec(sum(decFix(col("l_extendedprice")))).cast("double").as("sum_base_price"),
          dec(sum(decFix(col("l_extendedprice") * (lit(1) - col("l_discount"))))).cast("double").as("sum_disc_price"),
          // charge = 2dp*2dp*2dp is an exact 6-decimal real: sum at scale
          // 6 so no rounding happens (engines' double→decimal tie-rounding
          // differs at scale 4).
          sum(decFix(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // B12: count-distinct per group (two-phase distinct aggregate).
    "q12_count_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count_distinct(col("o_custkey")).as("n_cust"))
        .orderBy(col("o_orderstatus"))),

    // B13: exact twin of the HLL query (approx_count_distinct is bench/
    // test-only — not hash-comparable across engines by design).
    "q13_distinct_exact_twin" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(count_distinct(col("l_partkey")).as("n_parts"))),

    // B14: rollup + GROUPING().
    "q14_rollup" -> ((s, d) => {
      val j = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      j.rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n"))
        .select(col("g_r"), col("g_n"), col("r_name"), col("n_name"), col("n_cust"))
        .orderBy(col("g_r"), col("g_n"), col("r_name"), col("n_name"))
    }),

    // B15: top-k (TakeOrderedAndProject — no global sort at scale).
    "q15_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // B16: ranking window — top-3 orders per customer.
    "q16_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // B17: analytic window with frame — running sum per user over events.
    "q17_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("running_value", dec(sum(dec(col("value"))).over(w)).cast("double"))
        .select(col("user_id"), col("event_id"), nsToStr(col("ts")).as("ts_s"), col("running_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // B18: set operations (EXCEPT + INTERSECT, distinct semantics).
    "q18_set_ops" -> ((s, d) => {
      val ordered = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      val negbal = Tables.customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      val ex = ordered.except(negbal).withColumn("op", lit("except"))
      val in = ordered.intersect(negbal).withColumn("op", lit("intersect"))
      ex.unionByName(in).select(col("op"), col("custkey")).orderBy(col("op"), col("custkey"))
    }),

    // B19: string function suite.
    "q19_string_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_type")).as("type_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy(col("p_partkey"))
        .limit(100)),

    // B20: date/time function suite.
    "q20_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          min(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))).cast("long").as("min_day_offset"))
        .select(date_format(col("m"), "yyyy-MM-dd").as("month"),
          year(col("m")).cast("long").as("y"),
          month(col("m")).cast("long").as("mo"),
          col("n_orders"), col("min_day_offset"))
        .orderBy(col("month"))),

    // B21: math on doubles (identical IEEE ops), decimal-cast pre-sum.
    "q21_math_decimal" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          dec(sum(decFix(col("l_extendedprice") * (lit(1) - col("l_discount"))))).cast("double").as("revenue"),
          sum(floor(col("l_quantity") / 7).cast("long")).as("sum_floor7"),
          sum(ceil(col("l_tax") * 100).cast("long")).as("sum_ceil_tax"),
          dec(sum(decFix(abs(col("l_discount") - 0.05)))).cast("double").as("sum_absdev"))
        .orderBy(col("l_returnflag"))),

    // B22: array higher-order functions over embeddings. The fold starts at
    // 0.0 and runs left-to-right — same IEEE sum order as the DuckDB twin.
    "q22_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          decD(element_at(col("embedding"), 1).cast("double")).as("e1"),
          decD(element_at(col("embedding"), 2).cast("double")).as("e2"),
          decD(element_at(col("embedding"), 3).cast("double")).as("e3"),
          decD(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double"))).as("vec_sum"))
        .orderBy(col("vec_id"))
        .limit(100)),

    // B23: map functions — per-flag counts built into a map (sorted
    // entries), then exploded back to rows so the oracle stays comparable.
    "q23_map_funcs" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      counts
        .agg(map_from_entries(sort_array(collect_list(struct(col("l_returnflag"), col("cnt"))))).as("m"))
        .select(explode(col("m")).as(Seq("l_returnflag", "cnt")))
        .orderBy(col("l_returnflag"))
    }),

    // B24: JSON extraction from events.props.
    "q24_json_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n"), dec(sum(dec(col("value")))).cast("double").as("sum_value"))
        .orderBy(col("k")))
  )

  override def oracle: Map[String, String] = Map(
    "q01_scan_count" ->
      "SELECT COUNT(*) AS cnt_all FROM lineitem",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_inner" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q04_join_broadcast" ->
      """SELECT r_name, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name, n_name""".stripMargin,

    "q05_join_left_outer" ->
      """SELECT c_custkey, c_name FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IS NULL ORDER BY c_custkey""".stripMargin,

    "q06_join_anti" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey LIMIT 100""".stripMargin,

    "q07_join_full_outer" ->
      """WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1),
        |     c AS (SELECT c_nationkey AS nk2, COUNT(*) AS c_cnt FROM customer GROUP BY 1)
        |SELECT COALESCE(nk, nk2) AS nationkey,
        |       COALESCE(s_cnt, 0) AS s_cnt, COALESCE(c_cnt, 0) AS c_cnt
        |FROM s FULL OUTER JOIN c ON nk = nk2 ORDER BY nationkey""".stripMargin,

    "q08_join_cross" ->
      """SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
        |FROM region r1, region r2 WHERE r1.r_regionkey < r2.r_regionkey
        |ORDER BY r1_name, r2_name""".stripMargin,

    "q09_join_range" ->
      s"""WITH b AS (SELECT DISTINCT date_trunc('year', o_orderdate) AS y_start FROM orders),
         |     b2 AS (SELECT y_start, y_start + INTERVAL 12 MONTH AS y_end FROM b)
         |SELECT strftime(y_start, $TS) AS y, COUNT(*) AS n_orders,
         |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
         |FROM orders JOIN b2 ON o_orderdate >= y_start AND o_orderdate < y_end
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_asof_join" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, event_type FROM events
         |           WHERE event_type IN ('click','purchase')),
         |p AS (SELECT user_id, event_id, ts, event_type,
         |        MAX(CASE WHEN event_type='click' THEN ts END) OVER
         |          (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_ts
         |      FROM e)
         |SELECT user_id, event_id, strftime(ts, $TS) AS ts_s,
         |       COALESCE(strftime(prior_click_ts, $TS), 'none') AS prior_click_s
         |FROM p WHERE event_type='purchase' ORDER BY user_id, event_id""".stripMargin,

    "q11_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q12_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_distinct_exact_twin" ->
      "SELECT COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem",

    "q14_rollup" ->
      """SELECT CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n,
        |       r_name, n_name, COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q15_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q16_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q17_window_running" ->
      s"""SELECT user_id, event_id, strftime(ts, $TS) AS ts_s,
         |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS DOUBLE) AS running_value
         |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q18_set_ops" ->
      """WITH negbal AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0),
        |ex AS (SELECT o_custkey AS custkey FROM orders EXCEPT SELECT custkey FROM negbal),
        |isec AS (SELECT o_custkey AS custkey FROM orders INTERSECT SELECT custkey FROM negbal)
        |SELECT 'except' AS op, custkey FROM ex
        |UNION ALL
        |SELECT 'intersect' AS op, custkey FROM isec
        |ORDER BY op, custkey""".stripMargin,

    "q19_string_funcs" ->
      """SELECT p_partkey, upper(p_type) AS type_u, substring(p_name, 1, 5) AS name5,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "q20_date_funcs" ->
      """SELECT strftime(m, '%Y-%m-%d') AS month,
        |       CAST(year(m) AS BIGINT) AS y, CAST(month(m) AS BIGINT) AS mo,
        |       n_orders, min_day_offset FROM (
        |  SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n_orders,
        |         CAST(MIN(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)) AS BIGINT) AS min_day_offset
        |  FROM orders GROUP BY 1) t
        |ORDER BY month""".stripMargin,

    "q21_math_decimal" ->
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(floor(l_quantity / 7) AS BIGINT)) AS BIGINT) AS sum_floor7,
        |  CAST(SUM(CAST(ceil(l_tax * 100) AS BIGINT)) AS BIGINT) AS sum_ceil_tax,
        |  CAST(CAST(SUM(CAST(abs(l_discount - 0.05) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_absdev
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,4)) AS DOUBLE) AS e1,
        |  CAST(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(18,4)) AS DOUBLE) AS e2,
        |  CAST(CAST(CAST(embedding[3] AS DOUBLE) AS DECIMAL(18,4)) AS DOUBLE) AS e3,
        |  CAST(CAST(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                   (a, b) -> a + b) AS DECIMAL(18,4)) AS DOUBLE) AS vec_sum
        |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin,

    "q23_map_funcs" ->
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_json_funcs" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
