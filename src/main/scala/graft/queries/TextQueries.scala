package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Canon, Tables}
import Canon._

/** Text-analysis operators over `documents` (SURVEY.md B29 + north-star
  * text ops): token mining, n-gram-heuristic language ID, quality scoring,
  * token counting, rolling-hash fingerprinting.
  *
  * Scale design: everything is per-row narrow work (explode/regexp) +
  * hash aggregation — embarrassingly parallel at 100 TB. The only global
  * structure is the language wordlist dim, which is a broadcast literal.
  */
object TextQueries extends QueryGroup {

  private val P = 1000000007L

  /** Learned BPE merges, ONCE per (session, dataset) — bounded LRU with
    * the StreamTwins.landedLakes physics (the key strongly references
    * its SparkSession; unbounded would pin sessions). The merges are
    * deterministic, so caching changes cost, never values. */
  private val mergeCache =
    new java.util.LinkedHashMap[(SparkSession, String),
        Seq[graft.operators.BpeTrain.Merge]](16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String),
            Seq[graft.operators.BpeTrain.Merge]]): Boolean = size() > 8
    }

  /** One-time training wall-clock, surfaced by Bench as
    * elapsed_bpe_train_sec (the q87 landing-leg pattern). */
  @volatile var bpeTrainElapsedSec: Option[Double] = None

  private def trainedMerges(s: SparkSession, d: String): Seq[graft.operators.BpeTrain.Merge] =
    mergeCache.synchronized { Option(mergeCache.get((s, d))).getOrElse {
      val t0 = System.nanoTime()
      val m = graft.operators.BpeTrain.train(
        Tables.spread(Tables.documents(s, d)), "text", BpeRounds)
      bpeTrainElapsedSec = Some((System.nanoTime() - t0) / 1e9)
      mergeCache.put((s, d), m)
      m
    }}

  /** lowercase alpha tokens, empties removed — identical to the DuckDB twin
    * `list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')`. */
  private def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), x => x =!= "")

  private val langWords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "en" -> "in", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "des", "fr" -> "est")

  private def langWordsSqlValues: String =
    langWords.map { case (l, w) => s"('$l','$w')" }.mkString(", ")

  private val BpeRounds = 8

  /** One unrolled BPE merge round for the q89 DuckDB twin. Greedy
    * left-to-right application without recursion: occurrences of the
    * winning pair can only overlap when it is a SELF pair (l = r, a
    * run of the same symbol), and there the left-to-right scan merges
    * exactly the even offsets within each maximal run of matching
    * positions — a window computation (gaps-and-islands run id + the
    * offset-parity rule). Merged symbols never re-match in-round
    * (l ≠ l·r and r ≠ l·r), so one pass per round is exact. CTEs are
    * MATERIALIZED: each is referenced more than once and DuckDB's
    * default inlining re-evaluates the whole chain per reference
    * (measured 28× slower at 4 rounds). */
  private def bpeRoundSql(k: Int): String = {
    val p = s"syms_${k - 1}"
    s"""pairs_$k AS MATERIALIZED (
       |  SELECT s[u.i] AS l, s[u.i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS freq
       |  FROM $p, UNNEST(range(1, len(s))) AS u(i)
       |  GROUP BY 1, 2),
       |top_$k AS MATERIALIZED (
       |  SELECT l, r, freq FROM pairs_$k ORDER BY freq DESC, l, r LIMIT 1),
       |exp_$k AS MATERIALIZED (
       |  SELECT w, cnt, u.i AS pos, s[u.i] AS sym,
       |         COALESCE(s[u.i] = (SELECT l FROM top_$k)
       |                  AND s[u.i+1] = (SELECT r FROM top_$k), FALSE) AS hit
       |  FROM $p, UNNEST(range(1, len(s)+1)) AS u(i)),
       |runs_$k AS MATERIALIZED (
       |  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY w, hit ORDER BY pos) AS grp
       |  FROM exp_$k),
       |ch_$k AS MATERIALIZED (
       |  SELECT w, cnt, pos, sym,
       |         hit AND (pos - MIN(pos) OVER (PARTITION BY w, hit, grp)) % 2 = 0 AS chosen
       |  FROM runs_$k),
       |syms_$k AS MATERIALIZED (
       |  SELECT w, cnt,
       |         list(CASE WHEN chosen THEN (SELECT l || r FROM top_$k) ELSE sym END
       |              ORDER BY pos) AS s
       |  FROM (SELECT *, LAG(chosen, 1, FALSE) OVER (PARTITION BY w ORDER BY pos) AS prevch
       |        FROM ch_$k)
       |  WHERE NOT prevch GROUP BY w, cnt),
       |stat_$k AS MATERIALIZED (
       |  SELECT CAST($k AS BIGINT) AS rank, (SELECT l FROM top_$k) AS l,
       |         (SELECT r FROM top_$k) AS r, (SELECT freq FROM top_$k) AS freq,
       |         CAST(SUM(cnt * len(s)) AS BIGINT) AS n_syms FROM syms_$k)""".stripMargin
  }

  private def bpeLoopOracle: String =
    """WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |                x -> x <> '')) AS w FROM documents),
      |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY w),
      |syms_0 AS MATERIALIZED (SELECT w, cnt, string_split_regex(w, '') AS s FROM wc),
      |""".stripMargin +
      (1 to BpeRounds).map(bpeRoundSql).mkString(",\n") +
      "\nSELECT * FROM (" +
      (1 to BpeRounds).map(k => s"SELECT * FROM stat_$k").mkString(" UNION ALL ") +
      ") ORDER BY rank"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B29: top-50 corpus tokens.
    "q29_text_top_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)),

    // BPE trainer round-1 pair statistics (BpeTrain.pairStats): the
    // word-frequency collapse (vocabulary-sized — the corpus is read
    // once) and the adjacent-symbol-pair count whose argmax every merge
    // round takes. The iterative merge LOOP (driver-picked rule per
    // round, greedy left-to-right apply) is spec-verified against the
    // published worked example; its first-round algebra is hash-checked
    // here.
    "q85_bpe_pair_stats" -> ((s, d) =>
      graft.operators.BpeTrain.pairStats(
          Tables.spread(Tables.documents(s, d)), "text")
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(20)),

    // The BPE merge LOOP itself (r7 verdict item 2): BpeTrain.trainTrace
    // runs 8 full rounds — vocabulary-sized pair count, (freq desc, l,
    // r) argmax, greedy left-to-right apply — and emits one row per
    // round: the learned pair, its frequency, and the corpus
    // tokenization size AFTER the round (Σ cnt·|syms|). The DuckDB twin
    // recomputes all 8 rounds from scratch (unrolled CTE chain; greedy
    // application via the run-parity window rule — for a self-pair only
    // even offsets within a run of matches merge, which IS the
    // left-to-right scan), so the argmax chain, the deterministic
    // tie-break, AND the rewrite are all hash-checked. The per-round
    // 1-row argmax collect is inherent to BPE (each round's rule depends
    // on the last); every distributed pass is vocabulary-sized.
    "q89_bpe_merge_loop" -> ((s, d) => {
      val sess = s
      import sess.implicits._
      graft.operators.BpeTrain
        .trainTrace(Tables.spread(Tables.documents(s, d)), "text", BpeRounds)
        .map { case (m, nSyms) => (m.rank.toLong, m.left, m.right, m.freq, nSyms) }
        .toDF("rank", "l", "r", "freq", "n_syms")
        .orderBy(col("rank"))
    }),

    // Language ID by stopword-hit argmax (n-gram heuristic). The
    // wordlists are tiny literals, so scoring is pure per-row narrow
    // work: one size(filter(...)) per language + a greatest/CASE argmax
    // (ties → lexicographically smallest code, matching the oracle's
    // ORDER BY hits DESC, lang_c row_number). No explode, no join, no
    // window — the only shuffle is the tiny confusion-matrix groupBy.
    "q37_text_langid" -> ((s, d) => {
      val byLang = langWords.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val langs = byLang.keys.toSeq.sorted
      val t = Tables.spread(Tables.documents(s, d))
        .withColumn("t", toks(col("text")))
      val withHits = langs.foldLeft(t) { (df, l) =>
        df.withColumn(s"h_$l",
          size(filter(col("t"), x => x.isin(byLang(l): _*))).cast("long"))
      }
      val m = greatest(langs.map(l => col(s"h_$l")): _*)
      val caseChain = langs.tail.foldLeft(
        when(col(s"h_${langs.head}") === m, lit(langs.head))) { (c, l) =>
        c.when(col(s"h_$l") === m, lit(l))
      }
      withHits
        .select(col("lang"),
          when(m > 0, caseChain).otherwise(lit("und")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    // Quality scoring: token count, mean token length, stopword ratio,
    // composite score — all double math (IEEE-identical), decimal-rendered.
    "q38_text_quality" -> ((s, d) => {
      val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
      val base = Tables.spread(Tables.documents(s, d))
        .withColumn("t", toks(col("text")))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .withColumn("tok_chars",
          aggregate(transform(col("t"), x => length(x).cast("double")),
            lit(0.0), (a, x) => a + x))
        .withColumn("n_stop",
          size(filter(col("t"), x => x.isin(enStops: _*))).cast("long"))
      base
        .withColumn("avg_tok_len",
          coalesce(col("tok_chars") / nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)))
        .withColumn("stop_ratio",
          coalesce(col("n_stop").cast("double") / nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)))
        .withColumn("score",
          lit(0.4) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * col("stop_ratio") +
            lit(0.3) * least(col("avg_tok_len") / 10.0, lit(1.0)))
        .select(col("doc_id"), col("n_tokens"),
          ratio1e4(col("avg_tok_len")).as("avg_tok_len_1e4"),
          ratio1e4(col("stop_ratio")).as("stop_ratio_1e4"),
          ratio1e4(col("score")).as("score_1e4"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens + regex token classes (BPE-ish
    // pre-tokenizer: alpha runs | digit runs | single non-space symbols).
    "q39_text_tokencount" -> ((s, d) =>
      Tables.spread(Tables.documents(s, d)).select(
          col("doc_id"),
          size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_alpha"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).cast("long").as("n_num"),
          size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).cast("long").as("n_other"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))),

    // Repetition quality (boilerplate detector): duplicate-bigram ratio
    // and top-token frequency ratio per doc — the classic repetition
    // filters for training corpora. All narrow in-array work (nested
    // HOFs), no shuffle: per-doc cost is O(tokens · distinct-tokens) on
    // ~short docs, embarrassingly parallel at 100 TB.
    "q57_text_repetition" -> ((s, d) =>
      // spread first: the per-doc HOF work is the query's whole cost.
      Tables.spread(Tables.documents(s, d))
        .withColumn("t", toks(col("text")))
        .withColumn("bg",
          when(size(col("t")) >= 2,
            transform(sequence(lit(0), size(col("t")) - 2),
              i => concat_ws(" ", get(col("t"), i), get(col("t"), i + 1))))
            .otherwise(array().cast("array<string>")))
        .withColumn("n_tok", size(col("t")).cast("long"))
        .withColumn("n_2g", size(col("bg")).cast("long"))
        .withColumn("n_dist_2g", size(array_distinct(col("bg"))).cast("long"))
        // max token frequency == longest equal-run in the sorted array:
        // one O(n) fold per doc instead of the O(n·distinct) nested
        // filter-per-distinct-token formulation (HOF lambdas are
        // interpreted, so the quadratic form was the query's hot spot).
        .withColumn("top_tok",
          when(col("n_tok") > 0,
            aggregate(array_sort(col("t")),
              struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
              (acc, x) => {
                val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
                  .otherwise(lit(1L))
                struct(x.as("prev"), run.as("run"),
                  greatest(acc.getField("best"), run).as("best"))
              },
              acc => acc.getField("best")))
            .otherwise(lit(0L)))
        .select(col("doc_id"), col("n_tok"),
          when(col("n_2g") > 0,
            ratio1e4(lit(1.0) - col("n_dist_2g").cast("double") / col("n_2g").cast("double")))
            .otherwise(lit(0L)).as("dup_2g_1e4"),
          when(col("n_tok") > 0,
            ratio1e4(col("top_tok").cast("double") / col("n_tok").cast("double")))
            .otherwise(lit(0L)).as("top_tok_1e4"))
        .orderBy(col("doc_id"))),

    // Composite quality-filter verdict — the C4-style cleaning decision a
    // training pipeline actually executes: per source, how many docs
    // survive (quality score ≥ 0.5 AND duplicate-bigram ratio ≤ 0.3 AND
    // predicted language = en). Entirely per-row narrow work (the q38
    // score, q57 repetition, and q37 lang argmax fused into ONE pass over
    // the token array) + one tiny per-source groupBy — no join, no
    // window, no explode at any corpus size.
    "q71_quality_filter" -> ((s, d) => {
      val byLang = langWords.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val langs = byLang.keys.toSeq.sorted
      val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
      val base = Tables.spread(Tables.documents(s, d))
        .withColumn("t", toks(col("text")))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .withColumn("tok_chars",
          aggregate(transform(col("t"), x => length(x).cast("double")),
            lit(0.0), (a, x) => a + x))
        .withColumn("n_stop",
          size(filter(col("t"), x => x.isin(enStops: _*))).cast("long"))
        .withColumn("avg_tok_len",
          coalesce(col("tok_chars") / nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)))
        .withColumn("stop_ratio",
          coalesce(col("n_stop").cast("double") / nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)))
        .withColumn("score",
          lit(0.4) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * col("stop_ratio") +
            lit(0.3) * least(col("avg_tok_len") / 10.0, lit(1.0)))
        .withColumn("bg",
          when(size(col("t")) >= 2,
            transform(sequence(lit(0), size(col("t")) - 2),
              i => concat_ws(" ", get(col("t"), i), get(col("t"), i + 1))))
            .otherwise(array().cast("array<string>")))
        .withColumn("dup2g",
          when(size(col("bg")) > 0,
            lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
              size(col("bg")).cast("double"))
            .otherwise(lit(0.0)))
      val withHits = langs.foldLeft(base) { (df, l) =>
        df.withColumn(s"h_$l",
          size(filter(col("t"), x => x.isin(byLang(l): _*))).cast("long"))
      }
      val m = greatest(langs.map(l => col(s"h_$l")): _*)
      val caseChain = langs.tail.foldLeft(
        when(col(s"h_${langs.head}") === m, lit(langs.head))) { (c, l) =>
        c.when(col(s"h_$l") === m, lit(l))
      }
      withHits
        .withColumn("keep",
          col("score") >= 0.5 && col("dup2g") <= 0.3 &&
            when(m > 0, caseChain).otherwise(lit("und")) === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
        .select(col("source"), col("n_docs"), col("n_keep"),
          ratio1e4(col("n_keep").cast("double") / col("n_docs").cast("double")).as("keep_1e4"))
        .orderBy(col("source"))
    }),

    // N-gram language-model quality score — the KenLM/CCNet-style filter:
    // train a bigram LM on the corpus itself (unigram + bigram count
    // dims), score each doc by its mean Laplace-smoothed bigram log-prob
    // ln((c(w1,w2)+1) / (c(w1)+V)). Per-term log-probs are rendered to
    // 1e-6 fixed point BEFORE summing, so the per-doc sum is an exact
    // order-independent BIGINT (raw double sums would be engine-order-
    // sensitive). Scale shape: two count groupBys build the LM dims
    // (unigram dim is vocab-sized; the bigram dim joins by hash — never
    // broadcast, never global), scoring is a hash join of the doc bigram
    // stream against them; 16-byte rows only.
    // BPE ENCODE with the learned merges (round 8; the production
    // tokenizer APPLY step q89's training loop feeds): train 8 merges
    // on the corpus, then encode every document — the 8-entry merge
    // list rides along as plain data and the encode is ONE narrow map
    // (no shuffle at all after training). The DuckDB twin re-derives
    // the same merges via q89's unrolled round chain and joins each
    // doc's words to the final per-word symbol lengths, so the learned
    // vocabulary AND its application are hash-checked per doc.
    // Training runs ONCE per (session, dataset) — the production
    // decomposition (a tokenizer is trained once and applied
    // everywhere); q89 is the query that measures the training loop
    // itself, and Bench records the one-time cost as
    // elapsed_bpe_train_sec (the q87 landing-leg pattern).
    "q95_bpe_encode" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      graft.operators.BpeTrain.encodeTokens(s, docs, "text", "doc_id",
        trainedMerges(s, d))
        .select(col("doc_id"), col("n_bpe_symbols"))
        .orderBy(col("doc_id"))
    }),

    // DSIR-style importance weights (round 8; Xie et al. 2023's data
    // selection shape): per-doc log-likelihood ratio between a TARGET
    // unigram model (here: the lang='en' slice) and the BACKGROUND
    // model (whole corpus), add-1 smoothed over the shared vocabulary.
    // High-weight docs are the ones importance resampling keeps when
    // fitting a general crawl to a target domain. Same fixed-point
    // discipline as q72: per-token log-probs quantize to 1e-6 BEFORE
    // the order-independent per-doc sum, so the result is exact.
    // Scale: BOTH count dims come from ONE groupBy(token) pass
    // (conditional count for the target slice); dims join by token
    // hash — vocabulary-sized, never a corpus broadcast; the totals
    // row is the only broadcast (3 scalars).
    "q93_dsir_weights" -> ((s, d) => {
      // r14: the token stream feeds two consumers (the per-token dim
      // aggregation and the per-doc scoring join) — tokenizing twice
      // was a full second regex pass over the corpus. One eager
      // localCheckpoint of the PRE-explode (doc_id, lang, th) frame
      // (arrays, narrower than the exploded stream) tokenizes once;
      // both consumers explode from the materialized blocks (q32/q142
      // convention).
      val docs = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"),
          graft.operators.TextDedup.tokenHashes(col("text")).as("th"))
        .localCheckpoint(true)
      val stream = docs.select(col("doc_id"), col("lang"), explode(col("th")).as("t"))
      val dim = stream.groupBy(col("t")).agg(
        count(lit(1)).as("cb"),
        count(when(col("lang") === "en", 1)).as("ct"))
      val tot = dim.agg(sum(col("ct")).as("nt"), sum(col("cb")).as("nb"),
        count(lit(1)).as("v"))
      stream.join(dim, "t")
        .crossJoin(broadcast(tot))
        .withColumn("llr_1e6",
          floor(log((col("ct").cast("double") + 1.0) /
            (col("nt").cast("double") + col("v").cast("double"))) * 1e6 + 0.5).cast("long") -
          floor(log((col("cb").cast("double") + 1.0) /
            (col("nb").cast("double") + col("v").cast("double"))) * 1e6 + 0.5).cast("long"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_toks"), sum(col("llr_1e6")).as("llr_sum_1e6"))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          ratio1e4(col("llr_sum_1e6").cast("double") /
            (col("n_toks").cast("double") * 1e6)).as("mean_llr_1e4"))
        .orderBy(col("doc_id"))
    }),

    "q72_ngram_lm_score" -> ((s, d) => {
      // r14: four consumers (uni dim, bigram dim, vocab, probe side)
      // re-tokenized the corpus three times (plan: 3 parquet scans).
      // Tokenize ONCE into a checkpointed (doc_id, th) frame — project
      // early (guide §2.3): only those two columns cross.
      val th = graft.operators.TextDedup.tokenHashes(col("text"))
      val docs = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), th.as("th"))
        .localCheckpoint(true)
      // non-distinct streams: counts need multiplicity
      val uniStream = docs.select(col("doc_id"), explode(col("th")).as("t1"))
      val bigStream = docs.select(col("doc_id"), explode(
          when(size(col("th")) >= 2,
            transform(sequence(lit(0), size(col("th")) - 2),
              i => struct(get(col("th"), i).as("t1"),
                ((get(col("th"), i) * 8191L + get(col("th"), i + 1)) % P).as("h"))))
            .otherwise(array().cast("array<struct<t1:bigint,h:bigint>>"))).as("bg"))
        .select(col("doc_id"), col("bg.t1").as("t1"), col("bg.h").as("h"))
      val uni = uniStream.groupBy(col("t1")).agg(count(lit(1)).as("c1"))
      val big = bigStream.groupBy(col("h")).agg(count(lit(1)).as("c2"))
      val vocab = uniStream.select(countDistinct(col("t1")).as("v"))
      bigStream
        .join(big, "h")
        .join(uni, "t1")
        .crossJoin(broadcast(vocab))
        .withColumn("lp_1e6",
          floor(log((col("c2").cast("double") + 1.0) /
            (col("c1").cast("double") + col("v").cast("double"))) * 1e6 + 0.5)
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_1e6")).as("lp_sum_1e6"))
        .select(col("doc_id"), col("n_bigrams"),
          ratio1e4(col("lp_sum_1e6").cast("double") /
            (col("n_bigrams").cast("double") * 1e6)).as("mean_lp_1e4"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint: 31-base rolling hash mod 1e9+7 over the first
    // 256 chars. Fold starts at 0 which matches DuckDB's init-less
    // list_reduce (0*31 + c1 = c1).
    "q40_text_fingerprint" -> ((s, d) =>
      Tables.spread(Tables.documents(s, d))
        .withColumn("s", substring(col("text"), 1, 256))
        .withColumn("fp",
          when(length(col("s")) > 0,
            aggregate(transform(split(col("s"), ""), ch => ascii(ch).cast("long")),
              lit(0L), (h, c) => (h * 31L + c) % P))
            .otherwise(lit(0L)))
        .select(col("doc_id"), col("fp"))
        .orderBy(col("doc_id"))),

    // TF-IDF keyword extraction: top-3 terms per doc by tf·ln(N/df).
    // Corpus stats (df, N) computed over ALL docs; only the output is
    // restricted (doc_id < 200) so the declared result stays small. The
    // df dim is vocabulary-sized (Zipf — tiny next to the corpus) and
    // broadcast; N rides along as a broadcast 1-row aggregate, so the
    // per-doc scoring needs no extra wide op beyond the tf groupBy.
    // ln() of the same exact integers is the same libm-grade double in
    // both engines; tfidf is irrational so the 1e4 render is tie-safe.
    "q63_text_tfidf" -> ((s, d) => {
      // (r14 measured dead end: a checkpointed one-tokenize frame LOST
      // at the 10× corpus — 0.69 → 0.87 s median, PassProbe — the df
      // dim is the only full-corpus tokenize, the tf slice tokenizes
      // 200 docs, so the materialization buys nothing. Unlike q72/q93,
      // whose 2-3 full tokenize passes DID pay for one checkpoint.)
      val docs = Tables.spread(Tables.documents(s, d))
      // df straight off per-doc distinct tokens (in-row array_distinct →
      // explode → map-side-combining groupBy(token)): the corpus-wide
      // shuffle is vocabulary-sized per partition, NOT one row per
      // (doc, token). tf is per-doc-local arithmetic, so it is computed
      // only for the declared output's doc slice — no full-corpus
      // (doc_id, token) pre-aggregation shuffle exists at any scale.
      val dfDim = docs
        .select(explode(array_distinct(toks(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs.filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf_1e4").desc, col("token"))
      tf
        .join(broadcast(dfDim), "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf_1e4", ratio1e4(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("df"),
          col("tfidf_1e4"))
        .orderBy(col("doc_id"), col("rn"))
    })
  )

  private val strHashSqlW: String =
    """list_reduce(list_transform(range(1, length(w) + 1),
      |                           i -> CAST(ascii(w[i]) AS BIGINT)),
      |            (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin

  override def oracle: Map[String, String] = Map(
    // q95: the corpus-level merge chain is q89's (bpeRoundSql); the
    // encode twin is a join of per-doc words to the final per-word
    // symbol lengths of syms_8.
    "q95_bpe_encode" ->
      ("""WITH d0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                       x -> x <> '') AS toks
         |            FROM documents),
         |t AS (SELECT unnest(toks) AS w FROM d0),
         |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY w),
         |syms_0 AS MATERIALIZED (SELECT w, cnt, string_split_regex(w, '') AS s FROM wc),
         |""".stripMargin +
        (1 to BpeRounds).map(bpeRoundSql).mkString(",\n") +
        s"""
           |, wl AS (SELECT w, len(s) AS wlen FROM syms_$BpeRounds),
           |dt AS (SELECT doc_id, unnest(toks) AS w FROM d0),
           |j AS (SELECT doc_id, CAST(SUM(wlen) AS BIGINT) AS nb
           |      FROM dt JOIN wl USING (w) GROUP BY 1)
           |SELECT d0.doc_id, CAST(COALESCE(j.nb, 0) AS BIGINT) AS n_bpe_symbols
           |FROM d0 LEFT JOIN j USING (doc_id) ORDER BY d0.doc_id""".stripMargin),

    "q93_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |             list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                        x -> x <> ''), w -> $strHashSqlW) AS th
         |           FROM documents),
         |st AS (SELECT doc_id, lang, unnest(th) AS t1 FROM t),
         |dim AS (SELECT t1, COUNT(*) AS cb,
         |               COUNT(*) FILTER (lang = 'en') AS ct
         |        FROM st GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cb) AS BIGINT) AS nb,
         |               COUNT(*) AS v FROM dim),
         |sc AS (SELECT st.doc_id, st.lang,
         |         CAST(floor(ln((dim.ct + 1.0) / (tot.nt + tot.v)) * 1000000 + 0.5) AS BIGINT)
         |       - CAST(floor(ln((dim.cb + 1.0) / (tot.nb + tot.v)) * 1000000 + 0.5) AS BIGINT) AS llr
         |       FROM st JOIN dim ON st.t1 = dim.t1, tot),
         |agg AS (SELECT doc_id, lang, COUNT(*) AS n_toks, CAST(SUM(llr) AS BIGINT) AS llr_sum
         |        FROM sc GROUP BY 1, 2)
         |SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
         |       CAST(floor(llr_sum * 1.0 / (n_toks * 1000000.0) * 10000 + 0.5) AS BIGINT) AS mean_llr_1e4
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q72_ngram_lm_score" ->
      s"""WITH t AS (SELECT doc_id,
         |             list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                        x -> x <> ''), w -> $strHashSqlW) AS th
         |           FROM documents),
         |ug AS (SELECT doc_id, unnest(th) AS t1 FROM t),
         |bg AS (SELECT doc_id, th[i] AS t1, (th[i] * 8191 + th[i+1]) % 1000000007 AS h
         |       FROM t, unnest(range(1, greatest(len(th), 1))) u(i)),
         |uni AS (SELECT t1, COUNT(*) AS c1 FROM ug GROUP BY 1),
         |big AS (SELECT h, COUNT(*) AS c2 FROM bg GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT t1) AS v FROM ug),
         |sc AS (SELECT bg.doc_id,
         |         CAST(floor(ln((big.c2 + 1.0) / (uni.c1 + vv.v)) * 1000000 + 0.5) AS BIGINT) AS lp
         |       FROM bg JOIN big USING (h) JOIN uni ON bg.t1 = uni.t1, vv),
         |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(lp) AS BIGINT) AS lp_sum
         |        FROM sc GROUP BY 1)
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |       CAST(floor(lp_sum * 1.0 / (n_bigrams * 1000000.0) * 10000 + 0.5) AS BIGINT) AS mean_lp_1e4
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q63_text_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                                x -> x <> '')) AS token
        |           FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |              CAST(floor(tf.tf * ln(n.n_docs * 1.0 / df.df) * 10000 + 0.5) AS BIGINT) AS tfidf_1e4
        |       FROM tf JOIN df USING (token), n
        |       WHERE tf.doc_id < 200),
        |r AS (SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                     ORDER BY tfidf_1e4 DESC, token) AS rn
        |      FROM sc)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, token, tf, df, tfidf_1e4
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q29_text_top_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                            x -> x <> '')) AS token
        |  FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "q89_bpe_merge_loop" -> bpeLoopOracle,

    "q85_bpe_pair_stats" ->
      """WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                          x -> x <> '')) AS w FROM documents),
        |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY w),
        |p AS (SELECT substr(w, CAST(u.i AS INT), 1) AS l,
        |             substr(w, CAST(u.i AS INT) + 1, 1) AS r, cnt
        |      FROM wc, unnest(range(1, strlen(w))) u(i))
        |SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS freq
        |FROM p GROUP BY l, r ORDER BY freq DESC, l, r LIMIT 20""".stripMargin,

    "q37_text_langid" ->
      s"""WITH lw(lang_c, word) AS (VALUES $langWordsSqlValues),
         |tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                              x -> x <> '')) AS token FROM documents),
         |hits AS (SELECT doc_id, lang_c, COUNT(*) AS hits
         |         FROM tok JOIN lw ON token = word GROUP BY 1, 2),
         |best AS (SELECT doc_id, lang_c,
         |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_c) AS rn
         |         FROM hits)
         |SELECT d.lang, COALESCE(b.lang_c, 'und') AS pred_lang, COUNT(*) AS n_docs
         |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q71_quality_filter" -> {
      val byLang = langWords.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val langs = byLang.keys.toSeq.sorted
      val langCols = langs.map(l =>
        s"CAST(len(list_filter(t, x -> x IN (${byLang(l).map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS h_$l")
        .mkString(",\n|    ")
      val mExpr = s"GREATEST(${langs.map(l => s"h_$l").mkString(", ")})"
      val predCase = langs.map(l => s"WHEN h_$l = $mExpr THEN '$l'").mkString(" ")
      s"""WITH b AS (
         |  SELECT source,
         |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS t
         |  FROM documents),
         |m AS (
         |  SELECT source,
         |    CAST(len(t) AS BIGINT) AS n_tokens,
         |    CASE WHEN len(t) > 0
         |         THEN list_reduce(list_transform(t, x -> CAST(length(x) AS DOUBLE)), (a, c) -> a + c)
         |         ELSE 0.0 END AS tok_chars,
         |    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop,
         |    CASE WHEN len(t) >= 2
         |         THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
         |         ELSE CAST([] AS VARCHAR[]) END AS bg,
         |    $langCols
         |  FROM b),
         |r AS (
         |  SELECT source,
         |    0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |      + 0.3 * COALESCE(CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0)
         |      + 0.3 * least(COALESCE(tok_chars / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0) / 10.0, 1.0) AS score,
         |    CASE WHEN len(bg) > 0
         |         THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
         |         ELSE 0.0 END AS dup2g,
         |    CASE WHEN $mExpr > 0 THEN (CASE $predCase END) ELSE 'und' END AS pred
         |  FROM m),
         |k AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN score >= 0.5 AND dup2g <= 0.3 AND pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |  FROM r GROUP BY 1)
         |SELECT source, n_docs, n_keep,
         |  CAST(floor(n_keep * 1.0 / n_docs * 10000 + 0.5) AS BIGINT) AS keep_1e4
         |FROM k ORDER BY source""".stripMargin
    },

    "q38_text_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(t) > 0
        |         THEN list_reduce(list_transform(t, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
        |         ELSE 0.0 END AS tok_chars,
        |    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
        |  FROM base),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(tok_chars / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0) AS avg_tok_len,
        |    COALESCE(CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0) AS stop_ratio
        |  FROM m)
        |SELECT doc_id, n_tokens,
        |  CAST(floor(avg_tok_len * 10000 + 0.5) AS BIGINT) AS avg_tok_len_1e4,
        |  CAST(floor(stop_ratio * 10000 + 0.5) AS BIGINT) AS stop_ratio_1e4,
        |  CAST(floor((0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |            + 0.3 * stop_ratio
        |            + 0.3 * least(avg_tok_len / 10.0, 1.0)) * 10000 + 0.5) AS BIGINT) AS score_1e4
        |FROM r ORDER BY doc_id""".stripMargin,

    "q39_text_tokencount" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
        |  CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS BIGINT) AS n_other,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q57_text_repetition" ->
      """WITH b AS (SELECT doc_id,
        |             list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                         x -> x <> '') AS t
        |           FROM documents),
        |g AS (SELECT doc_id, t,
        |        CASE WHEN len(t) >= 2
        |             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |             ELSE CAST([] AS VARCHAR[]) END AS bg
        |      FROM b),
        |m AS (SELECT doc_id,
        |        CAST(len(t) AS BIGINT) AS n_tok,
        |        CAST(len(bg) AS BIGINT) AS n_2g,
        |        CAST(len(list_distinct(bg)) AS BIGINT) AS n_dist_2g,
        |        CASE WHEN len(t) > 0
        |             THEN list_max(list_transform(list_distinct(t),
        |                    x -> len(list_filter(t, y -> y = x))))
        |             ELSE 0 END AS top_tok
        |      FROM g)
        |SELECT doc_id, n_tok,
        |  CASE WHEN n_2g > 0
        |       THEN CAST(floor((1.0 - CAST(n_dist_2g AS DOUBLE) / CAST(n_2g AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
        |       ELSE 0 END AS dup_2g_1e4,
        |  CASE WHEN n_tok > 0
        |       THEN CAST(floor(CAST(top_tok AS DOUBLE) / CAST(n_tok AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |       ELSE 0 END AS top_tok_1e4
        |FROM m ORDER BY doc_id""".stripMargin,

    "q40_text_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN length(s) > 0
        |       THEN list_reduce(
        |              list_transform(range(1, length(s) + 1), i -> CAST(ascii(s[i]) AS BIGINT)),
        |              (h, c) -> (h * 31 + c) % 1000000007)
        |       ELSE 0 END AS fp
        |FROM (SELECT doc_id, substring(text, 1, 256) AS s FROM documents) t
        |ORDER BY doc_id""".stripMargin
  )
}
