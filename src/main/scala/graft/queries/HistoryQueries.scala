package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Changepoint, Cusum, Scd2}

/** Temporal-history operators (round 9, continued): dimension
  * versioning and level-shift detection — the "what changed, and when"
  * family a CDC-fed warehouse runs over its landed history.
  */
object HistoryQueries extends QueryGroup {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD2 build over each customer's order-status history: run-length
    // collapse (lag) + effective-dating (lead), both windows
    // entity-partitioned over ONE reused exchange. Ordering runs on the
    // full-precision timestamp; only the OUTPUT is rendered through the
    // canonical string protocol (Canon.tss ↔ strftime), and the tie
    // column makes same-instant orders deterministic.
    "q129_scd2_history" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate").as("t"),
        col("o_orderstatus").as("status"))
      Scd2.build(o, "o_custkey", "t", "o_orderkey", "status")
        .select(col("o_custkey"), col("status"), col("version"),
          graft.Canon.tss(col("eff_from")).as("eff_from_s"),
          graft.Canon.tss(col("eff_to")).as("eff_to_s"))
        .orderBy(col("o_custkey"), col("version"))
    }),

    // Point-in-time (as-of) fact→dimension join over the q129 SCD2
    // table — THE consumer a versioned dimension exists for: each fact
    // row joins the version row effective at its own instant
    // (eff_from <= t, eff_to NULL or > t). Zero-width versions (two
    // same-instant changes; the tie column orders them) are correctly
    // skipped by the end-exclusive interval, so every fact matches
    // EXACTLY one version.
    //
    // r14 shape: here facts and dimension derive from the SAME orders
    // table, so the PIT join is a window identity — the version
    // effective at a fact's instant f_t is the LAST change row with
    // t <= f_t (end-exclusive intervals ⇔ version-number maximality:
    // eff_to_v = t_{v+1} > f_t exactly when v is the largest version
    // with t_v <= f_t, and a zero-width version is never that max;
    // Scd2.asOfSameSource scaladoc carries the proof). That turns
    // 2 exchanges + an entity SMJ whose residual range predicate costs
    // O(k·v) per k-order/v-version customer into ONE entity exchange
    // and two window passes over the SAME sort — the q61 range-frame
    // discipline. Oracle unchanged (hash re-verified sf0.01 + sf0.1);
    // at 100 TB the hot-customer k·v blowup is gone and history shards
    // by entity exactly as before.
    "q134_scd2_pit" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate").as("t"),
        col("o_orderstatus").as("status"))
      Scd2.asOfSameSource(o, "o_custkey", "t", "o_orderkey", "status")
        .groupBy(col("status"), col("version"))
        .agg(count(lit(1)).as("n_facts"),
          min(col("o_orderkey")).as("min_ok"),
          max(col("o_orderkey")).as("max_ok"))
        .orderBy(col("status"), col("version"))
    }),

    // CUSUM split changepoint per event-type over the hourly rate
    // series (q120's grain): argmax_k |n·S_k − k·S_n| in BIGINT-closed
    // integer algebra — WHERE each feed's level shifted, not which
    // single buckets spike. Entity-partitioned windows only.
    "q131_changepoint" -> ((s, d) => {
      val hc = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 3600000000000").as("hr"))
        .agg(count(lit(1)).as("n"))
      Changepoint.split(hc, "event_type", "hr", "n")
        .select(col("event_type"), col("cp_bucket").as("cp_hr"),
          col("d_stat"), col("n_buckets"))
        .orderBy(col("event_type"))
    }),

    // CUSUM control chart per event-type (the ONLINE complement of
    // q131's retrospective split): the textbook alarm recurrence
    // T ← max(0, T + (x − μ)), unrolled exactly to prefix-sum minus
    // running-min — two windows over ONE entity-partitioned exchange,
    // all BIGINT (reference μ = Sn/n enters n-scaled, never divided).
    // The streaming twin (StreamingCusum.chart) runs the same
    // recurrence causally against a fixed reference; spec pins
    // stream ≡ batch on shuffled arrival.
    "q136_cusum_chart" -> ((s, d) => {
      val hc = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 3600000000000").as("hr"))
        .agg(count(lit(1)).as("n"))
      Cusum.alarmsRetro(hc, "event_type", "hr", "n", hSnMultiple = 4)
        .orderBy(col("event_type"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q129_scd2_history" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate AS t,
        |         o_orderstatus AS status
        |  FROM orders),
        |c AS (
        |  SELECT o_custkey, o_orderkey, t, status,
        |         LAG(status) OVER w AS prev
        |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY t, o_orderkey)),
        |ch AS (
        |  SELECT o_custkey, o_orderkey, t, status FROM c
        |  WHERE prev IS NULL OR prev <> status)
        |SELECT o_custkey, status,
        |       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
        |       strftime(t, '%Y-%m-%d %H:%M:%S') AS eff_from_s,
        |       strftime(LEAD(t) OVER w2, '%Y-%m-%d %H:%M:%S') AS eff_to_s
        |FROM ch WINDOW w2 AS (PARTITION BY o_custkey ORDER BY t, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,

    "q134_scd2_pit" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate AS t,
        |         o_orderstatus AS status
        |  FROM orders),
        |c AS (
        |  SELECT o_custkey, o_orderkey, t, status,
        |         LAG(status) OVER w AS prev
        |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY t, o_orderkey)),
        |ch AS (
        |  SELECT o_custkey, o_orderkey, t, status FROM c
        |  WHERE prev IS NULL OR prev <> status),
        |dim AS (
        |  SELECT o_custkey, status,
        |         CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
        |         t AS eff_from, LEAD(t) OVER w2 AS eff_to
        |  FROM ch WINDOW w2 AS (PARTITION BY o_custkey ORDER BY t, o_orderkey))
        |SELECT dim.status, dim.version,
        |       CAST(COUNT(*) AS BIGINT) AS n_facts,
        |       MIN(f.o_orderkey) AS min_ok, MAX(f.o_orderkey) AS max_ok
        |FROM orders f JOIN dim
        |  ON f.o_custkey = dim.o_custkey
        | AND dim.eff_from <= f.o_orderdate
        | AND (dim.eff_to IS NULL OR dim.eff_to > f.o_orderdate)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q131_changepoint" ->
      """WITH hc AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |sc AS (
        |  SELECT event_type, hr,
        |         SUM(n) OVER wp AS sk,
        |         CAST(COUNT(*) OVER wp AS BIGINT) AS k,
        |         SUM(n) OVER wt AS sn,
        |         CAST(COUNT(*) OVER wt AS BIGINT) AS nn
        |  FROM hc
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY hr
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wt AS (PARTITION BY event_type)),
        |d AS (
        |  SELECT event_type, hr, CAST(abs(nn * sk - k * sn) AS BIGINT) AS d_stat,
        |         nn AS n_buckets,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY abs(nn * sk - k * sn) DESC, hr) AS rn
        |  FROM sc)
        |SELECT event_type, hr AS cp_hr, d_stat, n_buckets
        |FROM d WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q136_cusum_chart" ->
      """WITH hc AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hr, n,
        |         SUM(n) OVER wt AS sn,
        |         CAST(COUNT(*) OVER wt AS BIGINT) AS nn
        |  FROM hc WINDOW wt AS (PARTITION BY event_type)),
        |r AS (
        |  SELECT event_type, hr, sn,
        |         SUM(nn * n - sn) OVER wp AS r
        |  FROM w
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY hr
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (
        |  SELECT event_type, hr, sn,
        |         r - LEAST(CAST(0 AS HUGEINT), MIN(r) OVER wp) AS t
        |  FROM r
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY hr
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type,
        |       CAST(COUNT(CASE WHEN t > 4 * sn THEN 1 END) AS BIGINT) AS n_alarms,
        |       MIN(CASE WHEN t > 4 * sn THEN hr END) AS first_alarm,
        |       CAST(MAX(t) AS BIGINT) AS peak_t
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
