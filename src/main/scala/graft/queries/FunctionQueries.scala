package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{Aggregators, Fnv1aHash, NGrams}

/** Custom-function surface (SURVEY.md B13 approx / B31 UDF/UDAF/UDTF):
  * every extension mechanism exercised inside a declared query —
  * approx sketches (HLL bench-only; KMV oracle-exact), custom Generator
  * (oracle-exact), typed Aggregator (oracle-exact), codegen'd custom
  * Expression (oracle-exact — FNV-1a folds portably in DuckDB HUGEINT
  * arithmetic mod 2^64). */
object FunctionQueries extends QueryGroup {

  /** DuckDB twin of Fnv1aHash.hashUtf8 for an ASCII expression `e`:
    * byte-fold in HUGEINT, mod 2^64 — yields the UNSIGNED 64-bit hash. */
  private[queries] def duckFnv(e: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |    list_transform(range(1, strlen($e)+1), i -> CAST(ascii(($e)[i]) AS HUGEINT))),
       |  (acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616)""".stripMargin

  /** fmix64 (Murmur3 finalizer) over an unsigned-HUGEINT 64-bit value —
    * the DuckDB twin of [[graft.functions.Fmix64]]. xor and the >>33
    * shift (// 2^33) act directly on the HUGEINT; the wraparound
    * multiply is split hi/lo so no intermediate exceeds int128:
    * u·C mod 2^64 = ((u mod 2^32)·C + (u div 2^32)·(C mod 2^32)·2^32)
    * mod 2^64. Applied after [[duckFnv]] wherever the engine side
    * applies fmix64 — KMV needs full avalanche in the small-value tail
    * (the r10 SketchError finding: raw FNV's k-th minimum lands ~35%
    * low over short sequential key strings). */
  private[queries] def duckFmix(cols: String, from: String): String = {
    val M = "18446744073709551616" // 2^64
    s"""(SELECT ${cols}xor(u4, u4 // 8589934592) AS hv
       | FROM (SELECT ${cols}((u3 % 4294967296) * 14181476777654086739
       |              + (u3 // 4294967296) * 444984403 * 4294967296) % $M AS u4
       |   FROM (SELECT ${cols}xor(u2, u2 // 8589934592) AS u3
       |     FROM (SELECT ${cols}((u1 % 4294967296) * 18397679294719823053
       |                  + (u1 // 4294967296) * 3981806797 * 4294967296) % $M AS u2
       |       FROM (SELECT ${cols}xor(u0, u0 // 8589934592) AS u1
       |         FROM $from) s1) s2) s3) s4) """.stripMargin
  }

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), x => x =!= "")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B13 approx variant: HLL sketch, oracled as a BOUND-CHECK VERDICT
    // (r8 verdict item 4). The raw HLL estimates differ between engines
    // (different register layouts), so the hash-comparable result is the
    // deterministic triple (exact count, documented bound, whether each
    // engine's OWN approximation lands within bound·exact of it). Spark's
    // documented default rsd is 0.05 (approx_count_distinct); DuckDB's
    // HLL is tighter still, so within_bound=true on both sides unless an
    // engine's sketch machinery actually breaks — which is exactly what
    // this row should catch. Measured relative error recorded in
    // BASELINE.md; the exact twin is q13.
    "q42_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), 0.05).as("n_approx"))
        .select(col("n_exact"),
          lit(0.05).as("bound"),
          (abs(col("n_approx").cast("double") - col("n_exact").cast("double"))
            <= lit(0.05) * col("n_exact").cast("double")).as("within_bound"))),

    // Custom Generator (UDTF): one-pass word trigrams.
    "q43_udtf_ngrams" -> ((s, d) =>
      Tables.spread(Tables.documents(s, d))
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
    // over a composite key. pmod of the signed Java long equals the
    // unsigned hash mod 8 (2^64 ≡ 0 mod 8), so the DuckDB HUGEINT twin
    // hash-matches exactly.
    "q45_fnv_shard" -> ((s, d) =>
      Tables.orders(s, d)
        .select(pmod(Fnv1aHash.fnv1a64(concat_ws("-", col("o_custkey"), col("o_orderkey"))), lit(8))
          .cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))),

    // KMV (k-minimum-values) distinct-count sketch — the oracle-exact
    // approx-distinct path (the HLL variant q42 is bench-only). The
    // sketch state is the k smallest distinct portable hash values: it
    // is tiny, exactly mergeable across partitions/splits (union + top-k
    // — at 100 TB each executor keeps its local k minima, one reduce
    // merges them), and the estimator (k-1)·2^64/h_k is one double
    // division from identical exact integers in both engines. The FNV
    // hash is passed through the fmix64 finalizer: order-statistic
    // sketches sample the small-value TAIL, where raw FNV over short
    // sequential key strings is ~35% dense-low (measured: 54% KMV
    // overestimate at k=256 vs the 6.3% theoretical rsd — the r10
    // SketchError ledger); fmix64 restores full avalanche (7.2%).
    "q52_kmv_distinct" -> ((s, d) => {
      val k = 256
      val two64 = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
      val h = Tables.lineitem(s, d)
        .select(Fnv1aHash.fmix64(
          Fnv1aHash.fnv1a64(col("l_partkey").cast("string"))).as("h"))
        .distinct()
      // unsigned view of the signed 64-bit hash, exact in DECIMAL(21,0)
      val uh = when(col("h") < 0, col("h").cast("decimal(21,0)") + lit(two64))
        .otherwise(col("h").cast("decimal(21,0)"))
      val kth = h.select(uh.as("uh")).orderBy(col("uh")).limit(k)
        .agg(max(col("uh")).as("hk"), count(lit(1)).as("n_kept"))
      kth.select(
        col("n_kept"),
        floor(lit((k - 1).toDouble * math.pow(2, 64)) / col("hk").cast("double"))
          .cast("long").as("kmv_est"))
    }),

    // PER-GROUP KMV distinct sketches — the grouped form of q52 and the
    // real 100 TB shape (one mergeable sketch per dimension cell, not
    // one global). The k-minima per group come from a ranking window
    // that PLANS as WindowGroupLimit: each map task keeps only its
    // local top-k per group BEFORE the exchange (q105's pinned shape),
    // so the shuffle carries ≤ k rows per (task, group) — never the
    // distinct-hash stream. Groups with fewer than k distinct values
    // report their exact count (the sketch saturates to truth).
    "q126_kmv_per_group" -> ((s, d) => {
      val k = 64
      val two64 = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
      val h = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          Fnv1aHash.fmix64(
            Fnv1aHash.fnv1a64(col("l_partkey").cast("string"))).as("h"))
        .distinct()
      val uh = when(col("h") < 0, col("h").cast("decimal(21,0)") + lit(two64))
        .otherwise(col("h").cast("decimal(21,0)"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("uh"))
      h.select(col("l_returnflag"), uh.as("uh"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"), max(col("uh")).as("hk"))
        .select(col("l_returnflag"), col("n_kept"),
          when(col("n_kept") < k, col("n_kept"))
            .otherwise(floor(lit((k - 1).toDouble * math.pow(2, 64))
              / col("hk").cast("double")).cast("long")).as("kmv_est"))
        .orderBy(col("l_returnflag"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q42_approx_distinct" ->
      """WITH a AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
        |                  CAST(approx_count_distinct(l_partkey) AS BIGINT) AS n_approx
        |           FROM lineitem)
        |SELECT n_exact, CAST(0.05 AS DOUBLE) AS bound,
        |       abs(CAST(n_approx AS DOUBLE) - CAST(n_exact AS DOUBLE))
        |         <= 0.05 * CAST(n_exact AS DOUBLE) AS within_bound
        |FROM a""".stripMargin,

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
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_fnv_shard" ->
      s"""WITH k AS (SELECT CAST(o_custkey AS VARCHAR) || '-' || CAST(o_orderkey AS VARCHAR) AS key
         |           FROM orders),
         |h AS (SELECT ${duckFnv("key")} AS hv FROM k)
         |SELECT CAST(hv % 8 AS BIGINT) AS bucket, COUNT(*) AS n
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "q52_kmv_distinct" ->
      s"""WITH h0 AS (SELECT DISTINCT ${duckFnv("CAST(l_partkey AS VARCHAR)")} AS u0
         |            FROM lineitem),
         |h AS (SELECT hv FROM ${duckFmix("", "h0")} fm),
         |k AS (SELECT hv FROM h ORDER BY hv LIMIT 256)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
         |       CAST(floor(255.0 * 18446744073709551616.0 / CAST(MAX(hv) AS DOUBLE)) AS BIGINT) AS kmv_est
         |FROM k""".stripMargin,

    "q126_kmv_per_group" ->
      s"""WITH h0 AS (SELECT DISTINCT l_returnflag,
         |                   ${duckFnv("CAST(l_partkey AS VARCHAR)")} AS u0
         |            FROM lineitem),
         |h AS (SELECT l_returnflag, hv
         |      FROM ${duckFmix("l_returnflag, ", "h0")} fm),
         |r AS (SELECT l_returnflag, hv,
         |             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
         |      FROM h),
         |g AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |             MAX(hv) AS hk
         |      FROM r WHERE rn <= 64 GROUP BY 1)
         |SELECT l_returnflag, n_kept,
         |       CASE WHEN n_kept < 64 THEN n_kept
         |            ELSE CAST(floor(63.0 * 18446744073709551616.0
         |                            / CAST(hk AS DOUBLE)) AS BIGINT) END AS kmv_est
         |FROM g ORDER BY l_returnflag""".stripMargin
  )
}
