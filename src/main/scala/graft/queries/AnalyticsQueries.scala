package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Canon, Tables}
import graft.operators.{Bfs, Bucketed, CoOccur, FuzzyJoin, Funnel, PageRank, SessionPaths, Triangles}

/** Entity-resolution, behavioral-funnel, and graph-metric operators
  * (round 9 catalog growth): the analytics families a training-data /
  * product pipeline runs NEXT to the dedup and quality passes — fuzzy
  * record linkage for structured columns, ordered funnels over event
  * streams, and triangle counting for graph density. Each realizes a
  * distinct scale technique: blocking + length-prune (q113), per-stage
  * co-partitioned min-CASE chaining (q114), degree-ordered wedge joins
  * (q115).
  */
object AnalyticsQueries extends QueryGroup {

  /** The canonical co-purchase edge table — q118/q128/q130/q135/q150
    * all traverse the SAME graph (pairs of parts co-ordered in the 1/8
    * order subset), so it lands ONCE per (session, source) as a
    * 32-bucket parquet table bucketed+sorted on the SOURCE VERTEX
    * (r11, the q144 materializeOnce lever): every iterative consumer's
    * edge⋈rank join and degree aggregation read the bucket layout with
    * zero Exchange on the |E|-sized side, and the basket explode that
    * builds the pairs runs once per session instead of once per query.
    * Layout: (u, v, w) — both orientations of each distinct undirected
    * edge, w = co-occurrence count (q118/q135/q150 prune w away;
    * q128 ranks by it). The repartition before landing puts each
    * bucket's rows in exactly one task → one file per bucket, so scans
    * also report the per-bucket sort order. */
  private[queries] def coEdges(s: SparkSession, d: String): DataFrame = {
    val sfx = Bucketed.contentSuffix(s, d)
    Bucketed.materializeOnce(
      {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 8 === 0)
        // pair occurrences at w=1: directedEdges' weight-merge groupBy
        // IS the co-occurrence count aggregation
        PageRank.directedEdges(
          CoOccur.pairs(li, "l_orderkey", "l_partkey")
            .withColumn("w", lit(1L)),
          "a", "b", Some("w"))
          .repartition(32, col("u"))
      },
      s"graft_co_edges_$sfx", "u", 32)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Blocked fuzzy self-match over part names: last-token blocking,
    // |Δlen| prune, Levenshtein ≤ 3 on the DISTINCT names (2k rows
    // collapse to 64 distinct — the dedupe-before-pairing step is the
    // whole ballgame at corpus scale). The oracle recomputes the same
    // blocked DP in DuckDB (both engines implement textbook
    // Wagner-Fischer; the hash compare covers every distance value).
    "q113_fuzzy_match" -> ((s, d) =>
      FuzzyJoin.selfEditPairs(Tables.part(s, d), "p_name",
          t => regexp_extract(t, "([a-z]+)$", 1), maxDist = 3)
        .orderBy(col("name_a"), col("name_b"))),

    // Strict-order view → click → purchase funnel over the event
    // stream: stage times chain through per-entity min(CASE) aggregates
    // on one co-partitioned key; the report is stage-reached counts.
    "q114_funnel" -> ((s, d) =>
      Funnel.report(Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    // Triangle count of the co-purchase graph (parts sharing an order):
    // the per-order pair fan-out is bounded by order size (≤ 7 lines),
    // and the count itself runs on degree-ORIENTED edges so wedge
    // fan-out is O(√m) per vertex regardless of hub degree. Fixture is
    // a 1/8 order subset: the FULL sf0.1 co-purchase graph is 1.2 M
    // edges / 1.9 M triangles dense (20 k parts × 600 k lines) — a
    // 30-50 s DuckDB oracle; the subset keeps the same algebra under
    // the per-round gate at ~150 k edges.
    "q115_triangles" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 8 === 0)
      val e = CoOccur.pairs(li, "l_orderkey", "l_partkey")
      Triangles.count(e, "a", "b")
    }),

    // Weekly retention cohorts: cohort = the Monday week of each user's
    // FIRST signup; one distinct (user, activity-week) pass, then a
    // cohort × week-offset user count. Weeks travel as integer
    // epoch-days of the week start (never a rendered date), and the
    // offset division is exact (week starts differ by multiples of 7).
    "q116_retention_cohorts" -> ((s, d) => {
      // r14 fusion (guide §2.4): the old shape scanned events twice and
      // exchanged three times (signup agg by user, activity distinct by
      // (user, week), then a join back on user). Both per-user facts —
      // first signup ts and the distinct activity weeks — now come from
      // ONE groupBy(user_id) pass (collect_set is bounded by the corpus
      // week span, never the event count), the explode replays the old
      // join rows exactly, and the rest of the algebra is untouched.
      val ev = Tables.events(s, d)
      val perUser = ev.select(col("user_id"), col("event_type"), col("ts_t"),
          unix_date(date_trunc("week", col("ts_t")).cast("date"))
            .cast("long").as("aw"))
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts_t"))).as("t0"),
          collect_set(col("aw")).as("aws"))
        .filter(col("t0").isNotNull)
        .select(unix_date(date_trunc("week", col("t0")).cast("date"))
            .cast("long").as("cw"),
          col("aws"))
      perUser.select(col("cw"), explode(col("aws")).as("aw"))
        .filter(col("aw") >= col("cw"))
        .groupBy(col("cw").as("cohort_week"),
          ((col("aw") - col("cw")) / 7).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // First-order Markov transition matrix of the event stream:
    // per-user lead() over (ts, event_id) — a window partitioned by
    // the entity key, so the sort is per-user-sized, never global —
    // then pair counts and the 1e-4 fixed-point transition probability
    // from exact integer (n, row-total) pairs.
    "q117_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val tot = Window.partitionBy(col("event_type"))
      pairs.select(col("event_type"), col("next_type"), col("n"),
          Canon.ratio1e4(col("n").cast("double") /
            sum(col("n")).over(tot).cast("double")).as("p_1e4"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    // Integer fixed-point PageRank (damping 17/20, scale 1e6, 4 static
    // iterations) over the co-purchase graph — every step closed over
    // BIGINT floor division, so the DuckDB twin unrolls the identical
    // algebra and the hash compare covers all four iterations. Same
    // 1/8 order subset as q115 (the full graph's density is a fixture
    // artifact, not an algorithmic need).
    "q118_pagerank" -> ((s, d) =>
      // exchange-free loop over the landed edge table (coEdges) — the
      // weight column prunes away, the bucketed (u, v) pairs ARE the
      // distinct directed edges ranks() would rebuild
      PageRank.ranksOnPrepared(coEdges(s, d).select(col("u"), col("v")),
          iters = 4)
        .orderBy(col("pr").desc, col("v"))
        .limit(15)
        .select(col("v").as("p_partkey"), col("pr").as("pr_1e6"))),

    // Multi-source BFS over the co-purchase graph (q118's 1/8 subset):
    // hop distance from the seed parts (u % 97 == 0) out to 3 hops —
    // frontier ⋈ edges + anti-join per round, early-stopped at the
    // fixed point; distance is min-over-paths, so the answer is
    // schedule-invariant and the DuckDB twin unrolls the same rounds
    // declaratively. Aggregated per hop ring (count + id range).
    "q135_bfs_hops" -> ((s, d) => {
      // the landed edge table replaces the per-query basket explode +
      // checkpoint: (u, v) is already the both-orientations directed
      // edge list, materialized once per session (coEdges)
      val dir = coEdges(s, d).select(col("u"), col("v"))
      val seeds = dir.select(col("u")).distinct().filter(col("u") % 97 === 0)
      Bfs.hops(dir, "u", "v", seeds, maxHops = 3)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_vertices"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("dist"))
    }),

    // Top session paths (30-min gap, q26's sessionization rule): the
    // exploratory complement of q114's fixed funnel — every session's
    // ordered event-type journey, frequency-ranked. The path assembles
    // IN-ROW (sort_array over collected (ts, tie, type) structs), so
    // no second windowed pass over the stream.
    "q119_session_paths" -> ((s, d) =>
      SessionPaths.topPaths(Tables.events(s, d), "user_id", "ts",
        "event_id", "event_type", gapNs = 30L * 60L * 1000000000L, k = 15)),

    // Rolling anomaly detection over the hourly event-rate series: a
    // bucket is anomalous when (x−μ)² > (2σ)² against its trailing
    // 6-bucket window — spelled ENTIRELY in integers as
    // (k·x−S)² > 4·(k·Q−S²), the q50 exact-moments trick, so no
    // sqrt/float crosses engines. rangeBetween on the integer hour
    // keeps missing buckets out of the frame honestly.
    "q120_rate_anomaly" -> ((s, d) => {
      val hc = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 3600000000000").as("hr"))
        .agg(count(lit(1)).as("n"))
      val win = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rangeBetween(-5, 0)
      hc.select(col("event_type"), col("hr"), col("n"),
          count(lit(1)).over(win).as("k"),
          sum(col("n")).over(win).as("s"),
          sum(col("n") * col("n")).over(win).as("q"))
        .withColumn("dev2",
          (col("k") * col("n") - col("s")) * (col("k") * col("n") - col("s")))
        .withColumn("thr", lit(4L) * (col("k") * col("q") - col("s") * col("s")))
        .filter(col("dev2") > col("thr"))
        .select(col("event_type"), col("hr"), col("n"), col("k"),
          col("dev2"), col("thr"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Market-basket lift: parts co-ordered more than chance —
    // lift = N·c_ab / (c_a·c_b) at 1e-4 fixed point from exact integer
    // counts (no log, which engines round differently). Pair fan-out
    // is bounded by order size; the support floor (c_ab ≥ 3) prunes
    // the pair table before any join.
    "q121_basket_lift" -> ((s, d) => {
      // three slices over the ONE checkpointed basket table (pairs +
      // item frequencies + group count). A fused single-shuffle form
      // (markers + singles + pairs in one explode/agg) was measured
      // 1.44 s → 1.88 s at sf0.1 and reverted: the ×1.6 explode volume
      // costs more than the two extra slice passes over cached blocks.
      // Apriori item pruning (CoOccur.pruneInfrequentItems) is OFF here
      // by measurement: every part is in ~30 orders at this SF, so the
      // floor prunes 0 of 20000 items (BasketProbe r10) and the pruning
      // pass would be pure cost. On a long-tail corpus it goes first.
      val b = CoOccur.baskets(Tables.lineitem(s, d), "l_orderkey", "l_partkey")
      val nOrders = b.agg(count(lit(1)).as("n_orders"))
      val ca = b.select(explode(col("ps")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("c"))
      // pair agg widened explicitly (same shuffle, defaultParallelism
      // reducers): 0.54 s -> 0.28 s at sf0.1 vs inheriting the bench
      // session's 4 shuffle partitions (BasketProbe r10). PACKED pair
      // keys (r11): ~every pair is unique here, so the aggregation
      // shuffles the whole pair stream — the 8-byte packed long beats
      // the struct by ~12% at the 10x corpus (BasketProbe r11), noise
      // below ~1M pairs (the r10 read; superseded at volume).
      val p = s.sparkContext.defaultParallelism
      val rawPairs = CoOccur.packedPairsFromBaskets(b)
      // COST-GATED count-floor pre-kill (r12, verdict item 1): ~every
      // pair here is unique, so the aggregation shuffles the full pair
      // stream just to count-1-and-drop it. Above the gate, one extra
      // narrow pass builds a saturating count sketch (CountFloor) and
      // kills pairs that CANNOT reach the c_ab >= 3 floor BEFORE the
      // exchange — answer-identical (the sketch only over-estimates;
      // CoOccurSpec pins prekilled ≡ plain). The gate is the EXACT
      // pair total (one tiny agg over the checkpointed baskets):
      // below it the extra pass costs more than the small shuffle it
      // saves (BasketProbe r12 A/B), so the sf0.1 bench path is
      // untouched; the default engages around the 10× corpus volume.
      val nPairs = {
        val r = b.agg(sum(size(col("ps")).cast("long") *
          (size(col("ps")).cast("long") - 1L))).head()
        (if (r.isNullAt(0)) 0L else r.getLong(0)) / 2L
      }
      val minPairs = s.conf.getOption("spark.graft.basket.prekillMinPairs")
        .map(_.toLong).getOrElse(8000000L)
      val prePairs =
        if (nPairs >= minPairs) {
          // basket-loop builder: the sketch pass reads the checkpointed
          // basket blocks at array speed instead of re-running the HOF
          // pair explode (which cost more than the saved shuffle,
          // BasketProbe r12)
          // expectedKeys capped to the sketch's byte budget (r13
          // ADVICE): past ~2^28 pairs the sketch runs at a higher load
          // factor (more false keeps, same answer) instead of throwing
          // at exactly the corpus sizes the pre-kill exists for
          val sk = graft.operators.CountFloor.sketchPackedPairs(b, "ps",
            math.min(nPairs, graft.operators.CountFloor.maxKeysFor()))
          rawPairs.filter(graft.operators.CountFloor.atLeast(sk, col("pk"), 3))
        } else rawPairs
      val pairs = prePairs
        .repartition(p, col("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
        .select(expr("shiftright(pk, 32)").as("pa"),
          (col("pk") % 4294967296L).as("pb"), col("c_ab"))
      pairs
        .join(broadcast(ca.select(col("p").as("pa"), col("c").as("c_a"))), Seq("pa"))
        .join(broadcast(ca.select(col("p").as("pb"), col("c").as("c_b"))), Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("c_ab"),
          Canon.ratio1e4(col("n_orders").cast("double") * col("c_ab").cast("double")
            / (col("c_a").cast("double") * col("c_b").cast("double")))
            .as("lift_1e4"))
        .orderBy(col("lift_1e4").desc, col("pa"), col("pb"))
        .limit(20)
    }),

    // Peak concurrent sessions (the capacity question): session
    // intervals [first_event, last_event + 1ns) from q26's gap rule,
    // swept by the TWO-PHASE distributed prefix sum in IntervalSweep —
    // range-sliced local running sums + a triangular offset join on
    // the per-slice totals — instead of the single-task global window
    // the textbook sweep would be. Result is partitioning-independent
    // (running-value multiset over a total order).
    "q122_max_concurrency" -> ((s, d) => {
      val sess = graft.operators.SessionPaths.sessions(Tables.events(s, d),
          "user_id", "ts", "event_id", gapNs = 30L * 60L * 1000000000L)
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("t0"), (max(col("ts")) + 1).as("t1"))
      graft.operators.IntervalSweep.maxConcurrent(sess, "t0", "t1")
    }),

    // WEIGHTED integer PageRank over the co-purchase graph: edge
    // weight = co-occurrence count (a pair ordered together 50× pulls
    // more mass than a once-pair). Same BIGINT-closed algebra as q118
    // with weight-proportional shares; same 1/8 subset fixture; the
    // DuckDB twin unrolls all four weighted iterations.
    "q128_pagerank_weighted" -> ((s, d) =>
      PageRank.ranksWeightedOnPrepared(coEdges(s, d), iters = 4)
        .orderBy(col("pr").desc, col("v"))
        .limit(15)
        .select(col("v").as("p_partkey"), col("pr").as("pr_1e6"))),

    // 8-core of the co-purchase graph by bounded-round peeling (8
    // peels — the fixture graphs reach their fixed point inside the
    // bound at every SF, asserted in KCoreSpec): the densely
    // co-purchased part community that survives when weakly attached
    // parts drop away. Per round: one degree aggregation + two
    // vertex-keyed semi-joins over a per-round checkpointed edge list;
    // the DuckDB twin unrolls the identical eight rounds.
    "q130_kcore" -> ((s, d) => {
      // the landed table IS KCore's canonical both-orientations form —
      // the prepared entry skips the re-canonicalize+checkpoint
      graft.operators.KCore.peelOnPrepared(coEdges(s, d), k = 8, rounds = 8)
        .select(col("v").as("p_partkey"), col("core_deg"))
        .orderBy(col("core_deg").desc, col("p_partkey"))
        .limit(25)
    }),

    // PERSONALIZED PageRank from a seed part set (round 10; "relevance
    // FROM these items" — the related-item expansion ranking, vs
    // q118's global centrality): restart mass lands only on seeds, so
    // rank concentrates around them; same BIGINT-closed algebra
    // (PageRank.ranksPersonalized scaladoc), seeds ≡ all-vertices
    // reduces exactly to q118's recursion (spec-pinned).
    "q150_pagerank_personalized" -> ((s, d) => {
      val dir = coEdges(s, d).select(col("u"), col("v"))
      // seeds intersect the graph's vertex set inside the operator
      // anyway (non-vertex seeds contribute nothing — scaladoc), so
      // deriving them from the landed table's vertices is exact
      val seeds = dir.select(col("u")).distinct()
        .filter(col("u") % 97 === 0)
      graft.operators.PageRank.ranksPersonalizedOnPrepared(dir, seeds, iters = 4)
        .select(col("v").as("p_partkey"), col("pr").as("pr_1e6"))
        .orderBy(col("pr_1e6").desc, col("p_partkey"))
        .limit(15)
    })
  )

  override def oracle: Map[String, String] = Map(
    "q113_fuzzy_match" ->
      """WITH v AS (
        |  SELECT p_name AS t, CAST(COUNT(*) AS BIGINT) AS n,
        |         regexp_extract(p_name, '([a-z]+)$', 1) AS bk
        |  FROM part GROUP BY 1, 3)
        |SELECT l.t AS name_a, r.t AS name_b,
        |       CAST(levenshtein(l.t, r.t) AS BIGINT) AS dist,
        |       l.n AS n_a, r.n AS n_b
        |FROM v l JOIN v r ON l.bk = r.bk AND l.t < r.t
        |WHERE abs(length(l.t) - length(r.t)) <= 3
        |  AND levenshtein(l.t, r.t) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "q114_funnel" ->
      """WITH t0 AS (
        |  SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS t0
        |  FROM events GROUP BY 1),
        |t1 AS (
        |  SELECT e.user_id, MIN(e.ts) FILTER (WHERE e.event_type = 'click'
        |           AND e.ts > t0.t0) AS t1
        |  FROM events e JOIN t0 ON e.user_id = t0.user_id GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, MIN(e.ts) FILTER (WHERE e.event_type = 'purchase'
        |           AND e.ts > t1.t1) AS t2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_entities,
        |       CAST(COUNT(t0.t0) AS BIGINT) AS n_view,
        |       CAST(COUNT(t1.t1) AS BIGINT) AS n_click,
        |       CAST(COUNT(t2.t2) AS BIGINT) AS n_purchase
        |FROM t0 LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)""".stripMargin,

    "q115_triangles" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_orderkey % 8 = 0),
        |e0 AS (
        |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM (SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        |  GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |              THEN e0.a ELSE e0.b END AS u,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b)
        |              THEN e0.b ELSE e0.a END AS w
        |  FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        |wg AS (
        |  SELECT o1.u AS u, o2.w AS w
        |  FROM o o1 JOIN o o2 ON o1.w = o2.u)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM wg
        |        WHERE EXISTS (SELECT 1 FROM o
        |                      WHERE o.u = wg.u AND o.w = wg.w)) AS n_triangles""".stripMargin,

    "q116_retention_cohorts" ->
      """WITH f AS (
        |  SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c AS (
        |  SELECT user_id,
        |         CAST(datediff('day', DATE '1970-01-01',
        |              CAST(date_trunc('week', t0) AS DATE)) AS BIGINT) AS cw
        |  FROM f),
        |a AS (
        |  SELECT DISTINCT user_id,
        |         CAST(datediff('day', DATE '1970-01-01',
        |              CAST(date_trunc('week', ts) AS DATE)) AS BIGINT) AS aw
        |  FROM events)
        |SELECT cw AS cohort_week, (aw - cw) // 7 AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM c JOIN a USING (user_id)
        |WHERE aw >= cw
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q117_event_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |       CAST(floor(CAST(n AS DOUBLE)
        |         / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |         * 10000 + 0.5) AS BIGINT) AS p_1e4
        |FROM c ORDER BY 1, 2""".stripMargin,

    "q118_pagerank" -> {
      val iterCte = (1 to 4).map { i =>
        s"""p$i AS (
           |  SELECT dg.u AS v,
           |         CAST(150000 + (17 * COALESCE(s.m, 0)) // 20 AS BIGINT) AS pr
           |  FROM deg dg LEFT JOIN (
           |    SELECT dir.v AS v, SUM(p${i - 1}.pr // deg.d) AS m
           |    FROM dir JOIN p${i - 1} ON p${i - 1}.v = dir.u
           |             JOIN deg ON deg.u = dir.u
           |    GROUP BY 1) s ON s.v = dg.u)"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |            WHERE l_orderkey % 8 = 0),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |dir AS (SELECT a AS u, b AS v FROM e0
         |        UNION ALL SELECT b AS u, a AS v FROM e0),
         |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM dir GROUP BY 1),
         |p0 AS (SELECT u AS v, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |$iterCte
         |SELECT v AS p_partkey, pr AS pr_1e6
         |FROM p4 ORDER BY pr DESC, v LIMIT 15""".stripMargin
    },

    "q135_bfs_hops" -> {
      val roundCte = (1 to 3).map { k =>
        s"""r$k AS (
           |  SELECT v, MIN(dist) AS dist FROM (
           |    SELECT v, dist FROM r${k - 1}
           |    UNION ALL
           |    SELECT dir.v, CAST($k AS BIGINT) AS dist
           |    FROM dir JOIN r${k - 1} f ON f.v = dir.u
           |    WHERE f.dist = ${k - 1}) x$k
           |  GROUP BY v)"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |            WHERE l_orderkey % 8 = 0),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |dir AS (SELECT a AS u, b AS v FROM e0
         |        UNION ALL SELECT b AS u, a AS v FROM e0),
         |r0 AS (SELECT DISTINCT u AS v, CAST(0 AS BIGINT) AS dist
         |       FROM dir WHERE u % 97 = 0),
         |$roundCte
         |SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_vertices,
         |       MIN(v) AS min_v, MAX(v) AS max_v
         |FROM r3 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q119_session_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |p AS (
        |  SELECT user_id, sid,
        |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin,

    "q120_rate_anomaly" ->
      """WITH h AS (
        |  SELECT event_type,
        |         CAST(datediff('hour', TIMESTAMP '1970-01-01',
        |              date_trunc('hour', ts)) AS BIGINT) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hr, n,
        |         CAST(COUNT(*) OVER win AS BIGINT) AS k,
        |         CAST(SUM(n) OVER win AS BIGINT) AS s,
        |         CAST(SUM(n*n) OVER win AS BIGINT) AS q
        |  FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hr
        |                        RANGE BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hr, n, k,
        |       (k*n - s)*(k*n - s) AS dev2,
        |       4*(k*q - s*s) AS thr
        |FROM w WHERE (k*n - s)*(k*n - s) > 4*(k*q - s*s)
        |ORDER BY event_type, hr""".stripMargin,

    "q121_basket_lift" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM li),
        |ca AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY 1),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS c_ab
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT pa, pb, c_ab,
        |       CAST(floor(CAST(n.n_orders AS DOUBLE) * CAST(c_ab AS DOUBLE)
        |         / (CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))
        |         * 10000 + 0.5) AS BIGINT) AS lift_1e4
        |FROM pairs JOIN ca x ON x.p = pairs.pa
        |           JOIN ca y ON y.p = pairs.pb
        |           CROSS JOIN n
        |ORDER BY lift_1e4 DESC, pa, pb LIMIT 20""".stripMargin,

    "q122_max_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |iv AS (
        |  SELECT user_id, sid, MIN(epoch_ns(ts)) AS t0,
        |         MAX(epoch_ns(ts)) + 1 AS t1
        |  FROM s GROUP BY 1, 2),
        |d AS (SELECT t0 AS t, 1 AS dd FROM iv
        |      UNION ALL SELECT t1 AS t, -1 AS dd FROM iv),
        |r AS (SELECT t, SUM(dd) OVER (ORDER BY t, dd
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
        |      FROM d),
        |m AS (SELECT MAX(active) AS mx FROM r)
        |SELECT CAST(m.mx AS BIGINT) AS max_concurrent,
        |       CAST(MIN(r.t) AS BIGINT) AS at_t
        |FROM r, m WHERE r.active = m.mx GROUP BY 1""".stripMargin,

    "q128_pagerank_weighted" -> {
      val iterCte = (1 to 4).map { i =>
        s"""p$i AS (
           |  SELECT wt.u AS v,
           |         CAST(150000 + (17 * COALESCE(s.m, 0)) // 20 AS BIGINT) AS pr
           |  FROM wtot wt LEFT JOIN (
           |    SELECT dir.v AS v, SUM((p${i - 1}.pr * dir.w) // wtot.wt) AS m
           |    FROM dir JOIN p${i - 1} ON p${i - 1}.v = dir.u
           |             JOIN wtot ON wtot.u = dir.u
           |    GROUP BY 1) s ON s.v = wt.u)"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |            WHERE l_orderkey % 8 = 0),
         |bk AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM li),
         |e0 AS (
         |  SELECT a.p AS a, b.p AS b, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM bk a JOIN bk b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2),
         |dir AS (SELECT a AS u, b AS v, w FROM e0
         |        UNION ALL SELECT b AS u, a AS v, w FROM e0),
         |wtot AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wt FROM dir GROUP BY 1),
         |p0 AS (SELECT u AS v, CAST(1000000 AS BIGINT) AS pr FROM wtot),
         |$iterCte
         |SELECT v AS p_partkey, pr AS pr_1e6
         |FROM p4 ORDER BY pr DESC, v LIMIT 15""".stripMargin
    },

    "q150_pagerank_personalized" -> {
      val iterCte = (1 to 4).map { i =>
        s"""p$i AS (
           |  SELECT dg.u AS v,
           |         CAST(COALESCE(sd2.s, 0) * 150000
           |              + (17 * COALESCE(s.m, 0)) // 20 AS BIGINT) AS pr
           |  FROM deg dg
           |  LEFT JOIN sd sd2 ON sd2.u = dg.u
           |  LEFT JOIN (
           |    SELECT dir.v AS v, SUM(p${i - 1}.pr // deg.d) AS m
           |    FROM dir JOIN p${i - 1} ON p${i - 1}.v = dir.u
           |             JOIN deg ON deg.u = dir.u
           |    GROUP BY 1) s ON s.v = dg.u)"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |            WHERE l_orderkey % 8 = 0),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |dir AS (SELECT a AS u, b AS v FROM e0
         |        UNION ALL SELECT b AS u, a AS v FROM e0),
         |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM dir GROUP BY 1),
         |sd AS (SELECT u, CAST(1 AS BIGINT) AS s FROM deg WHERE u % 97 = 0),
         |p0 AS (SELECT dg.u AS v,
         |              CAST(COALESCE(sd.s, 0) * 1000000 AS BIGINT) AS pr
         |       FROM deg dg LEFT JOIN sd ON sd.u = dg.u),
         |$iterCte
         |SELECT v AS p_partkey, pr AS pr_1e6
         |FROM p4 ORDER BY pr DESC, v LIMIT 15""".stripMargin
    },

    "q130_kcore" -> {
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
      // each round references its predecessor three times — an
      // uninlined unroll is a 3^8-scan plan ("too many open files").
      val peelCte = (1 to 8).map { i =>
        s"""k$i AS MATERIALIZED (SELECT u FROM d${i - 1} GROUP BY u HAVING COUNT(*) >= 8),
           |d$i AS MATERIALIZED (SELECT e.u, e.v FROM d${i - 1} e
           |        WHERE e.u IN (SELECT u FROM k$i)
           |          AND e.v IN (SELECT u FROM k$i))"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |            WHERE l_orderkey % 8 = 0),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |d0 AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
         |       UNION ALL SELECT b AS u, a AS v FROM e0),
         |$peelCte
         |SELECT u AS p_partkey, CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM d8 GROUP BY 1
         |ORDER BY core_deg DESC, p_partkey LIMIT 25""".stripMargin
    }
  )
}
