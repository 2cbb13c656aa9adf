package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Canon.ratio1e4
import graft.operators.{LabelProp, LineDedup, TableDiff}

/** Corpus-curation + dataset-operations family (round 10): the
  * line-granular dedup, snapshot regression diff, community structure,
  * and robust-statistics passes a training-data pipeline runs between
  * ingestion and tokenization.
  */
object CurationQueries extends QueryGroup {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Line-level exact dedup + document reconstruction (C4/Gopher-style
    // boilerplate kill): every verbatim line survives only at its
    // globally first (doc_id, idx) occurrence; documents are rebuilt
    // from surviving lines in order. The keep-rule is a
    // partial-aggregable min(struct) per line hash — skew-immune (a
    // 100M-occurrence boilerplate line combines map-side), 16-byte
    // hash rows shuffle, payloads never do. r12: the FUSED chunked
    // rebuild (LineDedup.rebuildChunked) — corpus read + tokenized
    // exactly once, line arrays checkpointed doc_id-partitioned so the
    // occurrence explode and the kept-index join share the blocks with
    // no text exchange (was 2.7× DuckDB at 10× from the double scan).
    "q137_line_dedup" -> ((s, d) =>
      LineDedup.rebuildChunked(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "text", 8)
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          col("n_dropped"), col("cleaned"))
        .orderBy(col("doc_id"))),

    // Keyed snapshot diff — the regression gate before promoting a
    // refreshed dataset version (and the batch analog of a CDC feed:
    // the classes ARE insert/delete/update events). Two deterministic
    // snapshots derived from orders (key-ranges dropped on each side +
    // a price perturbation), diffed on the primary key: each side
    // reduces to (key, 64-bit payload fingerprint) before the single
    // full-outer join, so only 16-byte rows shuffle (TableDiff
    // scaladoc). Aggregated per class, fully sensitive via key range +
    // key checksum.
    "q138_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val older = o.filter(col("o_orderkey") % 10 =!= 3)
      val newer = o.filter(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      TableDiff.diff(older, newer, "o_orderkey")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k") % 997).as("k_checksum"))
        .orderBy(col("status"))
    }),

    // Deterministic synchronous label propagation (3 sweeps, min-label
    // tie-break) over the co-purchase graph — community structure for
    // related-item grouping. The per-round winner is one
    // partial-aggregable max(struct(cnt, -lbl)) per vertex, so a
    // celebrity vertex's neighbor labels combine map-side; under the
    // local gate the sweeps run driver-side, spec-pinned identical
    // (LabelProp scaladoc). Communities reported with size + id range.
    "q139_label_prop" -> ((s, d) => {
      // the SAME co-purchase graph as q118/q128/q130/q135/q150 — read
      // the session's bucketed edge landing instead of re-running the
      // basket explode + canonicalize (r11, AnalyticsQueries.coEdges)
      LabelProp.runOnPrepared(
          AnalyticsQueries.coEdges(s, d).select(col("u"), col("v")),
          rounds = 3)
        .groupBy(col("community"))
        .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .filter(col("n_members") >= 3)
        .orderBy(col("n_members").desc, col("community"))
    }),

    // Exact rolling median (trailing 7 orders) of each customer's
    // order value — the robust per-entity level estimate (a rolling
    // MEAN chases outliers; medians don't). Spark has no median window
    // function: the frame's values collect IN-ROW (bounded by the
    // 7-row frame, never the partition) and the lower median is an
    // array pick — entity-partitioned over one exchange, window sorts
    // are per-customer. Aggregated per customer (count + sum of
    // medians) so the output is compact but sensitive to every row.
    "q140_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, 0)
      val cents = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      val med = cents
        .withColumn("m", array_sort(collect_list(col("cents")).over(w)))
        .withColumn("med",
          element_at(col("m"), ((size(col("m")) + 1) / 2).cast("int")))
      med.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("med")).as("sum_med_cents"))
        .orderBy(col("o_custkey"))
    }),

    // Per-group OLS trend (slope of daily order count over time) in
    // the q50 integer-moment discipline: one aggregation produces the
    // exact BIGINT moments (n, Σx, Σy, Σxy, Σx²), the slope is a
    // single deterministic double expression rendered at 1e-6 — no
    // per-row float ever crosses an exchange, and both engines compute
    // IEEE-identical results from identical integers.
    "q141_trend_ols" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"),
          datediff(col("o_orderdate"), lit("1992-01-01")).as("x"))
        .agg(count(lit(1)).as("y"))
      val m = daily.groupBy(col("o_orderstatus")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // nullif-guarded denominator (r11 ADVICE): a group with a single
      // distinct x has zero x-variance — the slope is undefined, and an
      // unguarded 0/0 would cast NaN to null HERE while the DuckDB twin
      // ERRORS casting nan to BIGINT. NULL slope on both sides instead.
      m.select(col("o_orderstatus"), col("n").as("n_days"),
          floor((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            nullif(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"), lit(0.0)) *
            1000000.0 + 0.5).cast("long").as("slope_1e6"))
        .orderBy(col("o_orderstatus"))
    }),

    // Mergeable bottom-k hash-priority quantile sketch (QuantileSketch
    // scaladoc: min-k by a fixed total order is associative, so
    // partition sketches union + re-prune without seeing full data;
    // the plan is map-side WindowGroupLimit — k rows per group per map
    // task ever shuffle). Reported next to the exact q49-style
    // percentiles with the observed rank error at 1e-4, so the
    // sketch's ACCURACY is under the hash gate, not just its
    // determinism (the r10 sketch-ledger discipline).
    "q142_quantile_sketch" -> ((s, d) => {
      // value = whole dollars: the 1e-2-grain cents domain is ~the row
      // count (583 k distinct at sf0.1), which makes the EXACT-twin
      // histogram the table itself and its per-group windows the query
      // cost; whole dollars (104 k distinct) keep the resolution
      // meaningful and the exact side histogram-sized (measured 4.4 s
      // -> ~1 s at sf0.1)
      // r14 SketchProbe ledger: the 600 k-row scan+concat+fnv1a input
      // pass WAS the query (0.65 s of 1.58 isolated) and both branches
      // paid it. Now: spread (the fixture file is one row group — scan
      // is one task without it; no-op at scale), hash ONCE into a
      // narrow (g, usd, prio) frame, eager-checkpoint it (q32 pattern,
      // inside the timed run), and feed the sketch AND the exact twin
      // from the same pass. bottomKPre's (prio, value) tie-order keeps
      // the kept multiset identical (operator scaladoc), so the answer
      // is unchanged — oracle re-pinned both SFs.
      val li = Tables.spread(Tables.lineitem(s, d).select(
          col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber")))
        .select(col("l_returnflag").as("g"),
          floor(col("l_extendedprice")).cast("long").as("usd"),
          graft.operators.QuantileSketch.priority(
            concat_ws("-", col("l_orderkey"), col("l_linenumber")))
            .as("prio"))
        .localCheckpoint(eager = true)
      val sk = graft.operators.QuantileSketch.bottomKPre(
        li, "g", "usd", "prio", k = 128)
      val est = graft.operators.QuantileSketch.estimates(sk, "g",
        Seq("est_p50" -> 0.5, "est_p95" -> 0.95))
      val cw = Window.partitionBy(col("g")).orderBy(col("usd"))
      val nw = Window.partitionBy(col("g"))
      val cum = li.groupBy(col("g"), col("usd")).agg(count(lit(1)).as("c"))
        .withColumn("hi", sum(col("c")).over(cw))
        .withColumn("n", sum(col("c")).over(nw))
      def pick(p: Double) =
        min(when(col("hi") >= ceil(lit(p) * col("n")).cast("long"),
          col("usd")))
      val exact = cum.groupBy(col("g"))
        .agg(pick(0.5).as("ex_p50"), pick(0.95).as("ex_p95"))
      est.join(exact, "g")
        .select(col("g"), col("n_kept"),
          col("est_p50"), col("est_p95"), col("ex_p50"), col("ex_p95"),
          ratio1e4(abs(col("est_p50") - col("ex_p50")).cast("double") /
            col("ex_p50").cast("double")).as("err50_1e4"),
          ratio1e4(abs(col("est_p95") - col("ex_p95")).cast("double") /
            col("ex_p95").cast("double")).as("err95_1e4"))
        .orderBy(col("g"))
    }),

    // KL divergence of each source's token distribution against the
    // corpus mixture — the data-mixture drift diagnostic (which shard
    // stopped looking like the blend it feeds). Exact-integer counts
    // throughout; each term (c_st/N_s)·ln(c_st·N_g / (N_s·c_gt))
    // quantizes to 1e-6 BEFORE the per-source sum (the q72 fixed-point
    // discipline — ln of identical exact-integer ratios is the same
    // IEEE double in both engines). No smoothing needed: the sum runs
    // over tokens PRESENT in the source, where c_gt >= c_st > 0.
    //
    // Fused (r13, verdict item 2 — the q93 one-pass discipline): the
    // source dimension is tiny (20 here; gated ≤ 256), so BOTH count
    // dims come from ONE groupBy(token) pass with a conditional count
    // per source — c_gt is count(*) of the same row group. That kills
    // the r12 plan's second vocabulary-sized shuffle (cst → cgt) AND
    // the vocabulary join cst ⋈ cgt: everything after the single token
    // exchange is a shuffle-free aggregate over the narrow checkpointed
    // per-token dim (vocab × (K+1) longs), and the K output rows unpivot
    // from one driver-sized row via stack. Term doubles are bit-identical
    // to the unfused form: same exact-integer ratios, same IEEE ops,
    // same floor — only the plan shape changed. 10× A/B in BASELINE r13.
    "q143_kl_mixture" -> ((s, d) => {
      val srcs = Tables.documents(s, d).select(col("source")).distinct()
        .orderBy(col("source"))
        .collect().map(_.getString(0)).toIndexedSeq
      // The conditional-count fusion needs a small source dim (its
      // pivot is k-wide); outside that envelope the unfused two-dim
      // join form below carries the query instead of a hard failure.
      if (srcs.nonEmpty && srcs.size <= 256) klMixtureFused(s, d, srcs)
      else klMixtureJoined(s, d)
    }),

    // Exchange-free bucketed join (the warehouse co-location lever:
    // land both fact tables bucketed on the join key ONCE, join forever
    // with zero shuffle on either side — Bucketed scaladoc). The
    // bucketed layout materializes on the session's first call and is
    // reused after (land-once discipline); BucketedJoinSpec pins the
    // join plan to zero Exchange operators between the bucketed scans
    // and the SortMergeJoin. The ANSWER is bucketing-invariant, which
    // is exactly what the oracle's plain join checks.
    "q144_bucketed_join" -> ((s, d) => {
      val sfx = graft.operators.Bucketed.contentSuffix(s, d)
      val o = graft.operators.Bucketed.materializeOnce(
        Tables.orders(s, d).select(col("o_custkey"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents")),
        s"graft_bkt_orders_$sfx", "o_custkey", 32)
      val c = graft.operators.Bucketed.materializeOnce(
        Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        s"graft_bkt_customer_$sfx", "c_custkey", 32)
      graft.operators.Bucketed.join(o, c, "o_custkey", "c_custkey")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("c_nationkey"))
    }),

    // Diff→apply round trip (round 10; MERGE INTO semantics — the
    // CONSUMER side of q138's diff): the change set (upserts carrying
    // full new-side payloads, deletes carrying keys) applies to the
    // old snapshot, and the law applyChanges(older, changeSet(older,
    // newer)) ≡ newer is hash-gated end-to-end: the oracle computes
    // the aggregate DIRECTLY from the newer-snapshot expression, so a
    // single dropped/duplicated/mangled row anywhere in the
    // diff→apply path breaks the hash (the q111/q132 store≡scratch
    // discipline pointed at CDC merge).
    "q149_diff_apply" -> ((s, d) => {
      // (r14 measured dead end: eager-checkpointing the orders scan to
      // collapse the chain's 5 parquet scans to 1 LOST at the 10×
      // corpus — 1.80 → 2.04 s median, PassProbe — because the
      // materialization writes full-width payload rows while re-scans
      // of a page-cached parquet are nearly free, the q124 lesson. The
      // multi-scan shape stands; only 16-byte (k, fp) rows shuffle.)
      val o = Tables.orders(s, d)
      val older = o.filter(col("o_orderkey") % 10 =!= 3)
      val newer = o.filter(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      val rebuilt = graft.operators.TableDiff.applyChanges(older,
        graft.operators.TableDiff.changeSet(older, newer, "o_orderkey"),
        "o_orderkey")
      rebuilt.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .as("sum_cents"),
          min(col("o_orderkey")).as("min_k"),
          max(col("o_orderkey")).as("max_k"))
        .orderBy(col("o_orderstatus"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q137_line_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |occ AS (
        |  SELECT doc_id, i AS idx,
        |         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS line
        |  FROM t, unnest(range(0, (len(toks)+7)//8)) u(i)),
        |surv AS (
        |  SELECT doc_id, idx, line FROM (
        |    SELECT doc_id, idx, line,
        |           ROW_NUMBER() OVER (PARTITION BY line
        |                              ORDER BY doc_id, idx) AS rn
        |    FROM occ) WHERE rn = 1),
        |k AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |         string_agg(line, chr(10) ORDER BY idx) AS cleaned
        |  FROM surv GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines
        |        FROM occ GROUP BY 1)
        |SELECT tot.doc_id AS doc_id, n_lines,
        |       COALESCE(n_kept, 0) AS n_kept,
        |       n_lines - COALESCE(n_kept, 0) AS n_dropped,
        |       COALESCE(cleaned, '') AS cleaned
        |FROM tot LEFT JOIN k ON tot.doc_id = k.doc_id
        |ORDER BY tot.doc_id""".stripMargin,

    "q138_snapshot_diff" ->
      """WITH a AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 3),
        |b AS (SELECT * REPLACE (
        |        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
        |             ELSE o_totalprice END AS o_totalprice)
        |      FROM orders WHERE o_orderkey % 10 <> 7),
        |d AS (
        |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN b.o_orderkey IS NULL THEN 'deleted'
        |         WHEN a.o_custkey IS NOT DISTINCT FROM b.o_custkey
        |          AND a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
        |          AND a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice
        |          AND a.o_orderdate IS NOT DISTINCT FROM b.o_orderdate
        |          AND a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority
        |         THEN 'unchanged' ELSE 'changed' END AS status
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(k) AS min_k, MAX(k) AS max_k,
        |       CAST(SUM(k % 997) AS BIGINT) AS k_checksum
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q139_label_prop" -> {
      val roundCte = (1 to 3).map { i =>
        s"""l$i AS MATERIALIZED (
           |  SELECT u AS v, lbl FROM (
           |    SELECT e.u, l.lbl, COUNT(*) AS cnt,
           |           ROW_NUMBER() OVER (PARTITION BY e.u
           |                              ORDER BY COUNT(*) DESC, l.lbl) AS rn
           |    FROM dir e JOIN l${i - 1} l ON e.v = l.v
           |    GROUP BY e.u, l.lbl)
           |  WHERE rn = 1)"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |            WHERE l_orderkey % 8 = 0),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |dir AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
         |       UNION ALL SELECT b AS u, a AS v FROM e0),
         |l0 AS (SELECT DISTINCT u AS v, u AS lbl FROM dir),
         |$roundCte
         |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       MIN(v) AS min_v, MAX(v) AS max_v
         |FROM l3 GROUP BY 1 HAVING COUNT(*) >= 3
         |ORDER BY n_members DESC, community""".stripMargin
    },

    "q140_rolling_median" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (
        |  SELECT o_custkey,
        |         list_sort(list(cents) OVER (
        |           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM c)
        |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(arr[(len(arr)+1)//2]) AS BIGINT) AS sum_med_cents
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q142_quantile_sketch" ->
      s"""WITH li AS (
         |  SELECT l_returnflag AS g,
         |         CAST(floor(l_extendedprice) AS BIGINT) AS usd,
         |         CAST(l_orderkey AS VARCHAR) || '-' ||
         |           CAST(l_linenumber AS VARCHAR) AS kstr
         |  FROM lineitem),
         |h0 AS (SELECT g, usd, kstr,
         |              ${FunctionQueries.duckFnv("kstr")} AS u0 FROM li),
         |h AS (SELECT g, usd, kstr, hv
         |      FROM ${FunctionQueries.duckFmix("g, usd, kstr, ", "h0")} fm),
         |r AS (SELECT g, usd,
         |             ROW_NUMBER() OVER (PARTITION BY g
         |                                ORDER BY hv, usd, kstr) AS rn
         |      FROM h),
         |sk AS (SELECT g, usd FROM r WHERE rn <= 128),
         |est AS (
         |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |         list_sort(list(usd)) AS vals
         |  FROM sk GROUP BY 1),
         |e2 AS (SELECT g, n_kept,
         |         vals[CAST(ceil(0.5 * n_kept) AS BIGINT)] AS est_p50,
         |         vals[CAST(ceil(0.95 * n_kept) AS BIGINT)] AS est_p95
         |       FROM est),
         |x AS (
         |  SELECT g,
         |    MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
         |             THEN usd END) AS ex_p50,
         |    MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
         |             THEN usd END) AS ex_p95
         |  FROM (SELECT g, usd,
         |               ROW_NUMBER() OVER (PARTITION BY g ORDER BY usd) AS rn,
         |               COUNT(*) OVER (PARTITION BY g) AS n
         |        FROM li)
         |  GROUP BY 1)
         |SELECT e2.g AS g, n_kept, est_p50, est_p95, ex_p50, ex_p95,
         |  CAST(floor(CAST(abs(est_p50 - ex_p50) AS DOUBLE) /
         |             CAST(ex_p50 AS DOUBLE) * 10000 + 0.5) AS BIGINT)
         |    AS err50_1e4,
         |  CAST(floor(CAST(abs(est_p95 - ex_p95) AS DOUBLE) /
         |             CAST(ex_p95 AS DOUBLE) * 10000 + 0.5) AS BIGINT)
         |    AS err95_1e4
         |FROM e2 JOIN x ON e2.g = x.g ORDER BY e2.g""".stripMargin,

    "q143_kl_mixture" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS t
        |  FROM documents),
        |cst AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c_st
        |        FROM toks GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s,
        |              CAST(COUNT(*) AS BIGINT) AS n_types
        |       FROM cst GROUP BY 1),
        |cgt AS (SELECT t, CAST(SUM(c_st) AS BIGINT) AS c_gt
        |        FROM cst GROUP BY 1),
        |ng AS (SELECT CAST(SUM(c_gt) AS BIGINT) AS n_g FROM cgt),
        |term AS (
        |  SELECT cst.source,
        |    CAST(floor((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)) *
        |      ln(CAST(c_st * n_g AS DOUBLE) /
        |         CAST(n_s * c_gt AS DOUBLE)) * 1000000.0) AS BIGINT)
        |      AS term_1e6
        |  FROM cst JOIN cgt ON cst.t = cgt.t
        |           JOIN ns ON cst.source = ns.source
        |           CROSS JOIN ng)
        |SELECT term.source AS source, n_s AS n_tokens, n_types,
        |       CAST(SUM(term_1e6) AS BIGINT) AS kl_1e6
        |FROM term JOIN ns ON term.source = ns.source
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q149_diff_apply" ->
      """WITH nw AS (SELECT * REPLACE (
        |        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
        |             ELSE o_totalprice END AS o_totalprice)
        |      FROM orders WHERE o_orderkey % 10 <> 7)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_cents,
        |       MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
        |FROM nw GROUP BY 1 ORDER BY 1""".stripMargin,

    "q144_bucketed_join" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q141_trend_ols" ->
      """WITH daily AS (
        |  SELECT o_orderstatus,
        |         datediff('day', DATE '1992-01-01', o_orderdate) AS x,
        |         CAST(COUNT(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o_orderstatus,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx,
        |         CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT o_orderstatus, n AS n_days,
        |       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |                   CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |                  NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |                         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) *
        |                  1000000.0 + 0.5) AS BIGINT) AS slope_1e6
        |FROM m ORDER BY 1""".stripMargin
  )

  /** q143 fused form — the r13 one-token-pass conditional-count pivot,
    * valid when the source dim fits a k-wide aggregate (0 < k <= 256).
    * Sources whose documents tokenize to zero tokens are dropped (the
    * oracle derives its source dim from the tokenized stream, so they
    * never appear there); the unpivot builds its rows from typed lit()
    * structs, so no source string ever round-trips through SQL-literal
    * escaping.
    */
  private[graft] def klMixtureFused(
      s: SparkSession, d: String, srcs: IndexedSeq[String]): DataFrame = {
    val k = srcs.size
    // source index resolved ONCE per document row, BEFORE the token
    // explode — the conditional counts then compare a small int per
    // token instead of running k string equalities per token (the
    // string form measured 2.7 s vs 1.0 s at the 10× corpus)
    val siCol = srcs.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (src, i)) => when(col("source") === src, lit(i)).otherwise(acc)
    }
    // explode first, drop empties with a codegen ROW filter — the
    // interpreted filter() array-HOF allocated a second array per doc
    // and ran its lambda per element (token-count pass 1.11 s HOF vs
    // 0.66 s row-filter at the 10× corpus, KlProbe r13)
    val toks = Tables.documents(s, d).withColumn("si", siCol)
      .select(col("si"),
        explode(split(lower(col("text")), "[^a-z]+")).as("t"))
      .where(col("t") =!= "")
    // two-stage pivot: the token stream aggregates ONCE on (t, si)
    // with a single narrow count buffer (map-side combine does the
    // heavy lifting), and the k-wide conditional pivot then runs on
    // the vocab×k count rows — not on every token (the one-stage
    // k-wide agg measured 1.99 s vs 1.29 s at the 10× corpus)
    val cst = toks.groupBy(col("t"), col("si")).agg(count(lit(1)).as("c"))
    val dim = cst.groupBy(col("t")).agg(
      sum(when(col("si") === 0, col("c")).otherwise(0L)).as("c_0"),
      (1 until k).map(i =>
        sum(when(col("si") === i, col("c")).otherwise(0L)).as(s"c_$i")) :+
        sum(col("c")).as("c_gt"): _*)
      .localCheckpoint() // narrow vocab-sized frame, two consumers
    val tot = dim.agg(
      sum(col("c_0")).as("n_0"),
      ((1 until k).map(i => sum(col(s"c_$i")).as(s"n_$i")) ++
        (0 until k).map(i =>
          count(when(col(s"c_$i") > 0, 1)).as(s"v_$i")) :+
        sum(col("c_gt")).as("n_g")): _*)
    val withTot = dim.crossJoin(broadcast(tot))
    val sums = withTot.agg(
      sum(when(col("c_0") > 0,
        floor((col("c_0").cast("double") / col("n_0").cast("double")) *
          log((col("c_0") * col("n_g")).cast("double") /
            (col("n_0") * col("c_gt")).cast("double")) *
          1000000.0).cast("long")).otherwise(0L)).as("kl_0"),
      (1 until k).map(i =>
        sum(when(col(s"c_$i") > 0,
          floor((col(s"c_$i").cast("double") / col(s"n_$i").cast("double")) *
            log((col(s"c_$i") * col("n_g")).cast("double") /
              (col(s"n_$i") * col(s"c_gt")).cast("double")) *
            1000000.0).cast("long")).otherwise(0L)).as(s"kl_$i")): _*)
      .crossJoin(broadcast(tot))
    // unpivot the 1×3K row into (source, n_tokens, n_types, kl_1e6)
    val outRows = (0 until k).map { i =>
      struct(lit(srcs(i)).as("source"), col(s"n_$i").as("n_tokens"),
        col(s"v_$i").as("n_types"), col(s"kl_$i").as("kl_1e6"))
    }
    sums.select(explode(array(outRows: _*)).as("r"))
      .select(col("r.source").as("source"), col("r.n_tokens").as("n_tokens"),
        col("r.n_types").as("n_types"), col("r.kl_1e6").as("kl_1e6"))
      .where(col("n_tokens") > 0L)
      .orderBy(col("source"))
  }

  /** q143 unfused two-dim join form — the fallback when the source dim
    * is empty or too wide (> 256) for the k-wide pivot: c_st and c_gt
    * come from two aggregations over one shared token-count frame,
    * joined back on token. Same exact-integer ratios and quantization
    * as the fused plan, so the two forms are bit-identical where both
    * apply; the price of unbounded K is one extra vocabulary-sized
    * shuffle + join. Handles an empty documents table by construction
    * (every frame is empty → empty result, matching the oracle).
    */
  private[graft] def klMixtureJoined(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(split(lower(col("text")), "[^a-z]+")).as("t"))
      .where(col("t") =!= "")
    val cst = toks.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c_st"))
      .localCheckpoint() // narrow (source, token, long) frame, 3 consumers
    val ns = cst.groupBy(col("source")).agg(
      sum(col("c_st")).as("n_s"), count(lit(1)).as("n_types"))
    val cgt = cst.groupBy(col("t")).agg(sum(col("c_st")).as("c_gt"))
    val ng = cgt.agg(sum(col("c_gt")).as("n_g"))
    cst.join(cgt, "t")
      .join(ns, "source")
      .crossJoin(broadcast(ng))
      .select(col("source"), col("n_s"), col("n_types"),
        floor((col("c_st").cast("double") / col("n_s").cast("double")) *
          log((col("c_st") * col("n_g")).cast("double") /
            (col("n_s") * col("c_gt")).cast("double")) *
          1000000.0).cast("long").as("term_1e6"))
      .groupBy(col("source"), col("n_s"), col("n_types"))
      .agg(sum(col("term_1e6")).as("kl_1e6"))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_types"),
        col("kl_1e6"))
      .orderBy(col("source"))
  }
}
