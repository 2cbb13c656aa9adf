package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Canon, Tables}
import Canon._

/** Training-data pipeline operators (north-star): the dataset-assembly
  * steps between raw corpus and training shards — deterministic
  * train/val/test splitting, sequence packing against a token budget,
  * and PII detection. All per-row narrow work except the packing
  * window; every hash is engine-portable BIGINT math.
  */
object PipelineQueries extends QueryGroup {

  private val P = 1000000007L

  private def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), x => x =!= "")

  /** Portable split hash: ((doc_id mod P) * 40503 + 17) mod P, bucketed
    * to 1/1000ths. Stays in BIGINT range for any doc_id (no overflow at
    * 1e12 ids, unlike a raw Knuth multiply). */
  private def splitBucket(c: Column): Column =
    (((c % P) * 40503L + 17L) % P) % 1000L

  /** Bounded LRU like DedupQueries' store caches: entries hold
    * checkpointed RDD blocks (and transitively their SparkSession), so
    * the map must not grow with the number of sessions a long-lived
    * JVM creates. */
  private val labeledCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > 8
    }

  /** Per-doc pipeline labeling — the ONE frame q100 and q103 both
    * derive from (r11 verdict item: the audit used to re-derive every
    * stage predicate over the corpus). Each document of the spread
    * corpus carries (doc_id, lang, n_tokens, stage) where stage is the
    * FIRST pipeline stage that drops it (eval_holdout → exact_dedup →
    * quality → decontamination) or 'kept'. Memoized per (session,
    * source) behind an eager localCheckpoint — the coEdges/q144
    * land-once discipline: the labeling's tokenize + dedup window +
    * span semi-join run once per session, and both consumers (plus
    * warm bench re-runs) aggregate the materialized blocks. Source
    * immutability within a session is the same precondition the
    * testdata layout already guarantees (Bucketed.contentSuffix
    * protects the cross-process case; this cache dies with the JVM). */
  // keyed on the SESSION OBJECT, not its identity hash (review fix:
  // identityHashCode can collide between live sessions and is reusable
  // after GC — the DedupQueries store-cache convention)
  private def labeledDocs(s: SparkSession, d: String): DataFrame =
    labeledCache.synchronized {
      Option(labeledCache.get((s, d))).getOrElse {
        val built = buildLabeledDocs(s, d)
        labeledCache.put((s, d), built)
        built
      }
    }

  private def buildLabeledDocs(s: SparkSession, d: String): DataFrame = {
      val all = Tables.spread(Tables.documents(s, d))
      val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
      // one tokenize+score pass, materialized: three branches below
      // (corpus labeling, eval spans, holdout rows) consume it
      val base = all
        .withColumn("t", toks(col("text")))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .withColumn("tok_chars",
          aggregate(transform(col("t"), x => length(x).cast("double")),
            lit(0.0), (a, x) => a + x))
        .withColumn("n_stop",
          size(filter(col("t"), x => x.isin(enStops: _*))).cast("long"))
        .withColumn("score_1e4",
          ratio1e4(lit(0.4) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * coalesce(col("n_stop").cast("double") /
              nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)) +
            lit(0.3) * least(coalesce(col("tok_chars") /
              nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)) / 10.0, lit(1.0))))
        .localCheckpoint(true)
      val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
      val corpus = base.filter(col("doc_id") % 10 =!= 7)
        .withColumn("__h", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(w))
      val scored = corpus.filter(col("rn") === 1 && col("score_1e4") >= 5000)
      // spans from the already-tokenized column: the quality pass paid
      // the regexp split, the span kernel reuses its array
      val evalSpans = graft.operators.TextDedup
        .spanHashesOfTokens(base.filter(col("doc_id") % 10 === 7)
          .select(col("doc_id"), col("t")), "t", 5)
        .select(col("h").as("eh")).distinct()
      val contaminated = graft.operators.TextDedup
        .spanHashesOfTokens(scored.select(col("doc_id"), col("t")), "t", 5)
        .join(evalSpans, col("h") === col("eh"), "leftsemi")
        .select(col("doc_id")).distinct()
        .withColumn("is_cont", lit(1))
      val labeled = corpus.join(contaminated, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          when(col("rn") =!= 1, "exact_dedup")
            .when(coalesce(col("score_1e4"), lit(-1L)) < 5000, "quality")
            .when(col("is_cont").isNotNull, "decontamination")
            .otherwise("kept").as("stage"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      val holdout = base.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), col("lang"),
          lit("eval_holdout").as("stage"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      labeled.unionByName(holdout).localCheckpoint(true)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-order (Morton) layout clustering (round 8): the multi-dim lake
    // layout tool — interleave the bits of two clustering keys so that
    // sorting on the interleaved value bounds BOTH keys per file/row
    // group (Delta OPTIMIZE ZORDER's algebra). The query proves the
    // tile property under the oracle: bucketing the 16-bit z-value by
    // its top 8 bits must bound x AND y to a 16×16 tile in every
    // bucket (max-min ≤ 15 on both axes — the hash check pins the
    // exact interleave, not just the bound). ZOrderSpec proves the
    // file-skipping consequence on a real z-ordered parquet write.
    "q92_zorder_layout" -> ((s, d) =>
      Tables.events(s, d)
        .select(pmod(col("user_id"), lit(256L)).as("x"),
          pmod(col("event_id"), lit(256L)).as("y"))
        .withColumn("z", graft.operators.ZOrder.zValue(col("x"), col("y"), 8))
        .groupBy(expr("z div 256").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("bucket"))),

    // Hilbert-curve layout (round 10; the locality-stronger sibling of
    // q92's Z-order): consecutive Hilbert indices are always
    // GRID-ADJACENT cells — no Morton seam jumps — so range scans over
    // Hilbert-sorted files touch strictly fewer distant regions
    // (HilbertSpec proves the unit-step invariant exhaustively and
    // measures the locality win over Z on the same grid). Same bucket
    // accounting as q92, so the two layouts' min/max envelopes are
    // directly comparable; the oracle unrolls the 8 rotation levels as
    // a generated CTE chain (HilbertValue.hilbertCtes).
    "q148_hilbert_layout" -> ((s, d) =>
      Tables.events(s, d)
        .select(pmod(col("user_id"), lit(256L)).as("x"),
          pmod(col("event_id"), lit(256L)).as("y"))
        .withColumn("h",
          graft.functions.HilbertValue.hilbert(col("x"), col("y"), 8))
        .groupBy(expr("h div 256").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("bucket"))),

    // Deterministic 80/10/10 split: pure per-row hash — no sampling RNG,
    // no shuffle, reproducible across engines/runs/cluster sizes, and a
    // document keeps its split when the corpus grows (stable assignment).
    "q46_split_assign" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("b", splitBucket(col("doc_id")))
        .withColumn("split",
          when(col("b") < 800, "train").when(col("b") < 900, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("split"))),

    // Corpus mixture re-weighting (the balancing step of a training-data
    // recipe): give every language an equal share of the token budget,
    // downsample-only (weight = min(1, target/actual)). Two tiny
    // aggregations — per-group token totals, then a 1-row broadcast of
    // the grand total back onto the groups; the corpus-sized pass is the
    // narrow token count feeding the first groupBy. All ratio math is
    // one identical IEEE op sequence from exact BIGINTs in both engines.
    "q84_mixture_weights" -> ((s, d) => {
      val perLang = Tables.spread(Tables.documents(s, d))
        .select(col("lang"), size(toks(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("n_tok"))
      val tot = perLang.agg(
        sum(col("n_tok")).cast("long").as("total_tok"),
        count(lit(1)).as("n_langs"))
      // `div` = exact integral division (matches DuckDB's `//`); a
      // double divide-then-truncate could round differently at scale.
      val target = expr("total_tok div n_langs").cast("long")
      val w = least(lit(1.0), target.cast("double") / col("n_tok").cast("double"))
      perLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tok"),
          target.as("target_tok"),
          ratio1e4(w).as("w_1e4"),
          floor(col("n_tok").cast("double") * w + 0.5).cast("long").as("exp_tok"))
        .orderBy(col("lang"))
    }),

    // Group-relative quantile band filter (the "drop each language's
    // length outliers" curation step — q71's thresholds are absolute,
    // this one's adapt per group): per-lang nearest-rank p10/p90 of the
    // token count from the VALUE HISTOGRAM (q49's shape — the rank
    // arithmetic runs on histogram cells, never a row-level sort), and
    // the kept-set aggregates are ALSO computed from histogram cells
    // (n_kept = Σc, kept_tok = Σ n_tok·c over cells inside the band),
    // so the corpus is tokenized exactly ONCE. The whole plan is linear:
    // scan → histogram partial agg → per-lang windows → cell filter →
    // per-lang agg. No self-join, no second corpus pass; at 100 TB the
    // only corpus-sized work is the token count + histogram partial agg,
    // everything after is vocabulary-sized.
    "q86_quantile_filter" -> ((s, d) => {
      val t = Tables.spread(Tables.documents(s, d))
        .filter(col("text").isNotNull) // NULL text ranks differently per engine
        .select(col("lang"), size(toks(col("text"))).cast("long").as("n_tok"))
      val hist = t.groupBy(col("lang"), col("n_tok")).agg(count(lit(1)).as("c"))
      val cw = Window.partitionBy(col("lang")).orderBy(col("n_tok"))
      val nw = Window.partitionBy(col("lang"))
      def pick(p: Double) = // nearest-rank percentile as a whole-group window
        min(when(col("hi") >= ceil(lit(p) * col("n")).cast("long"), col("n_tok"))).over(nw)
      hist
        .withColumn("hi", sum(col("c")).over(cw))
        .withColumn("n", sum(col("c")).over(nw))
        .withColumn("p10", pick(0.1))
        .withColumn("p90", pick(0.9))
        .filter(col("n_tok") >= col("p10") && col("n_tok") <= col("p90"))
        .groupBy(col("lang"))
        .agg(sum(col("c")).cast("long").as("n_kept"),
          sum(col("n_tok") * col("c")).cast("long").as("kept_tok"),
          first(col("p10")).as("p10"), first(col("p90")).as("p90"))
        .orderBy(col("lang"))
    }),

    // Sequence packing: assign docs (in doc_id order) to fixed
    // token-budget bins of 512 by cumulative token count — the window
    // formulation of streaming greedy packing (library operator
    // SequencePacking.pack). Declared query packs the whole corpus in
    // one window for oracle determinism; q66 exercises the production
    // per-shard form.
    // The FULL batch training-data pipeline in ONE declarative plan
    // (round 8 flagship; the batch twin of q87's capture composition):
    // exact dedup (min-id per content) → q38 quality gate
    // (score_1e4 ≥ 5000) → decontamination against the held-out eval
    // slice (doc_id % 10 = 7; any shared 5-token span drops the doc)
    // → deterministic 80/10/10 split → per-(split, lang) corpus stats.
    // Every stage is the already-oracled library op; composing them
    // under one optimizer is the point — Catalyst fuses the narrow
    // quality/split stages, the dedup window and the span semi-join
    // stay the only wide ops, and the oracle hash-checks the WHOLE
    // pipeline's survivors, not stage outputs.
    // r11: derived from the SHARED labeledDocs frame (scaladoc above) —
    // the survivors are exactly the stage == 'kept' slice (the old
    // inline dedup→quality→decontamination chain and the labeling's
    // when-chain are the same algebra, previously pinned by the
    // q100/q103 reconciliation spec and re-proven by this query's
    // unchanged oracle hash); only the split bucketing and the final
    // aggregation remain per-query.
    "q100_pipeline_e2e" -> ((s, d) =>
      labeledDocs(s, d).filter(col("stage") === "kept")
        .withColumn("b", splitBucket(col("doc_id")))
        .withColumn("split",
          when(col("b") < 800, "train").when(col("b") < 900, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tok"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("split"), col("lang"))),

    // 3-DIMENSIONAL z-order layout (round 9; generalizes q92's 2-D
    // curve to the Delta/Iceberg multi-key clustering form): interleave
    // three 6-bit keys (bit i of dim d → bit 3i+d), bucket by the top 6
    // curve bits (= dropping 4 full bit-triples), and the oracle pins
    // that every bucket bounds ALL THREE coordinates to a 16-wide tile
    // — plus the exact interleave via the hash. ZOrder.zValueN expands
    // to plain codegen bit algebra; the SQL twin is generated from the
    // same term list.
    "q109_zorder3" -> ((s, d) => {
      val ks = Seq(
        pmod(col("user_id"), lit(64L)).as("x"),
        pmod(col("event_id"), lit(64L)).as("y"),
        pmod(col("user_id") + col("event_id"), lit(64L)).as("w"))
      Tables.events(s, d)
        .select(ks: _*)
        .withColumn("z", graft.operators.ZOrder.zValueN(
          Seq(col("x"), col("y"), col("w")), 6))
        .groupBy(expr("z div 4096").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          min(col("w")).as("min_w"), max(col("w")).as("max_w"))
        .orderBy(col("bucket"))
    }),

    // Deterministic balanced downsampling (round 9; the APPLY side of
    // q84's mixture weights): every language downsampled to the
    // smallest language's size by a ppm-rate hash filter — no RNG, no
    // order dependence, stable membership as the corpus grows. The
    // per-group rate dim is |langs|-sized and broadcast; everything
    // else is per-row integer algebra.
    "q104_mixture_sample" -> ((s, d) => {
      // No spread here (r14): the per-row work is ONE integer LCG hash —
      // not the compute-bound shape spread exists for — and base feeds
      // two consumers, so the blind repartition cost TWO exchanges of
      // the corpus per run (guide §2.4: remove shuffles outright). The
      // |langs|-sized kept agg broadcasts into the rates dim.
      val base = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val rates = graft.operators.Sampling.balancedRates(base, "lang")
      val kept = graft.operators.Sampling
        .balancedByGroup(base, "lang", "doc_id", rates)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("__k"), sum(col("doc_id")).cast("long").as("__s"))
      // left join from the rates dim: a group whose sample came up empty
      // still reports (n_kept = 0), matching the oracle's LEFT JOIN
      rates.join(broadcast(kept), Seq("lang"), "left")
        .select(col("lang"), col("n").as("n_before"), col("rate_1e6"),
          coalesce(col("__k"), lit(0L)).as("n_kept"),
          coalesce(col("__s"), lit(0L)).as("sum_kept_ids"))
        .orderBy(col("lang"))
    }),

    // Deterministic per-group "reservoir" (round 9): the k=25 docs with
    // the smallest priority hash per language — a uniform k-sample
    // under a fixed hash order, independent of scan order and
    // partitioning (a true reservoir is neither). Runs as a per-group
    // top-k window ⇒ WindowGroupLimit: partial top-k inside every map
    // task BEFORE the exchange, ~k rows per (task, group) shuffle.
    "q105_reservoir_per_group" -> ((s, d) =>
      graft.operators.Sampling.topKByPriority(
          Tables.spread(Tables.documents(s, d)).select(col("doc_id"), col("lang")),
          "lang", "doc_id", 25)
        .select(col("lang"), col("doc_id"), col("priority"))
        .orderBy(col("lang"), col("priority"), col("doc_id"))),

    // Pipeline DROP ACCOUNTING (round 9, r8 verdict item 7 — the
    // governance complement of q100): per-stage (stage, docs, tokens)
    // for every document the pipeline removes, emitted from ONE labeled
    // plan — each doc gets the FIRST stage that drops it (eval holdout →
    // exact dedup → quality → decontamination → kept) via a when-chain,
    // then a single conditional aggregation; no second corpus pass, no
    // per-stage re-run. The 'kept' row reconciles exactly with q100's
    // survivor totals by construction (identical stage algebra — same
    // dedup window, same score, same contamination set computed from the
    // quality survivors), and the oracle recomputes the whole labeling.
    // r11: one aggregation over the SHARED labeledDocs frame — the
    // per-stage predicates (dedup window, quality score, span
    // semi-join) run once per session in the labeling, not once per
    // audit (verdict item: q103 re-derived the q100 stage predicates
    // over the whole corpus).
    "q103_pipeline_audit" -> ((s, d) =>
      labeledDocs(s, d)
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tok"))
        .withColumn("stage_idx",
          when(col("stage") === "eval_holdout", 1L)
            .when(col("stage") === "exact_dedup", 2L)
            .when(col("stage") === "quality", 3L)
            .when(col("stage") === "decontamination", 4L)
            .otherwise(5L))
        .select(col("stage_idx"), col("stage"), col("n_docs"), col("sum_tok"))
        .orderBy(col("stage_idx"))),

    // Context-window CHUNKING with stride (round 8; the step before
    // packing in a pretraining/RAG pipeline): window 64 tokens, stride
    // 48 (16-token overlap) — chunk k covers tokens [48k, 48k+64) while
    // 48k < n. Emits one row per chunk with an exact content
    // fingerprint (polynomial fold of the chunk's token hashes), so
    // the oracle verifies chunk BOUNDARIES AND CONTENT, not just
    // counts. All narrow in-row HOF work — zero shuffles before the
    // presentation sort; doc_id bound keeps the fixture output small.
    "q98_chunk_stride" -> ((s, d) => {
      val th = graft.operators.TextDedup.tokenHashes(col("text"))
      Tables.spread(Tables.documents(s, d))
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), th.as("th"))
        .withColumn("n_tok", size(col("th")).cast("long"))
        .filter(col("n_tok") > 0) // sequence(0, -1) would run DOWNWARD
        .select(col("doc_id"), col("n_tok"), explode(
          transform(sequence(lit(0), expr("(n_tok + 47) div 48").cast("int") - 1),
            k => {
              val start = k.cast("long") * 48L
              val clen = least(lit(64L), col("n_tok") - start)
              struct(k.cast("long").as("chunk_idx"), clen.as("chunk_len"),
                aggregate(slice(col("th"), (start + 1L).cast("int"), clen.cast("int")),
                  lit(0L), (a, x) => (a * 8191L + x) % P).as("chunk_fp"))
            })).as("c"))
        .select(col("doc_id"), col("n_tok"), col("c.chunk_idx").as("chunk_idx"),
          col("c.chunk_len").as("chunk_len"), col("c.chunk_fp").as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "q47_sequence_packing" -> ((s, d) =>
      graft.operators.SequencePacking.pack(
          Tables.spread(Tables.documents(s, d))
            .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tok")),
          "doc_id", "n_tok", 512L)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("sum_tok"))
        .orderBy(col("bin"))
        .limit(200)),

    // Per-shard sequence packing — the 100 TB form: the same cumulative
    // window runs independently inside each of 8 deterministic hash
    // shards (Window.partitionBy(shard)), so no global order or
    // single-task window exists; bins are addressed by (shard, bin).
    "q66_packing_sharded" -> ((s, d) =>
      graft.operators.SequencePacking.packSharded(
          Tables.spread(Tables.documents(s, d))
            .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tok")),
          "doc_id", "n_tok", 512L,
          (((col("doc_id") % P) * 40503L + 17L) % P) % 8L)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("sum_tok"))
        .orderBy(col("shard"), col("bin"))
        .limit(400)),

    // PII detection: per-source counts of docs containing email / phone /
    // URL patterns (regex subset valid in both Java regex and RE2).
    "q48_pii_scan" -> ((s, d) => {
      val t = lower(col("text"))
      def flag(pat: String): Column =
        when(t.rlike(pat), 1L).otherwise(0L)
      Tables.spread(Tables.documents(s, d))
        .select(col("source"),
          flag("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+").as("f_email"),
          flag("[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]").as("f_phone"),
          flag("https?://").as("f_url"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f_email")).cast("long").as("n_email"),
          sum(col("f_phone")).cast("long").as("n_phone"),
          sum(col("f_url")).cast("long").as("n_url"))
        .orderBy(col("source"))
    }),

    // PII REDACTION (the step after q48's scan): replace every email,
    // phone, and URL match with a typed marker, per doc. Match counts
    // come from regexp_extract_all; the redacted text itself is
    // value-checked via its sha256 — a redactor that misses a match,
    // replaces only the first occurrence, or mangles surrounding text
    // hash-mismatches immediately. Narrow per-row work, no shuffle
    // before the render sort.
    "q74_pii_redact" -> ((s, d) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
      val phone = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
      val url = "https?://[^ ]+"
      val t = lower(col("text"))
      val redacted = regexp_replace(
        regexp_replace(regexp_replace(t, email, "<email>"), phone, "<phone>"),
        url, "<url>")
      Tables.spread(Tables.documents(s, d)).filter(col("doc_id") < 500)
        .select(col("doc_id"),
          size(regexp_extract_all(t, lit(email), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(t, lit(phone), lit(0))).cast("long").as("n_phone"),
          size(regexp_extract_all(t, lit(url), lit(0))).cast("long").as("n_url"),
          length(redacted).cast("long").as("redacted_len"),
          sha2(redacted, 256).as("redacted_sha"))
        .orderBy(col("doc_id"))
    })
  )

  /** Portable polynomial string hash (TextDedup.strHash twin). */
  private val strHashSqlW: String =
    """list_reduce(list_transform(range(1, length(w) + 1),
      |                           i -> CAST(ascii(w[i]) AS BIGINT)),
      |            (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q100_pipeline_e2e" ->
      s"""WITH dd AS (SELECT MIN(doc_id) AS doc_id
         |            FROM documents WHERE doc_id % 10 <> 7 GROUP BY text),
         |d2 AS (SELECT d.doc_id, d.lang, d.text FROM documents d
         |       JOIN dd ON d.doc_id = dd.doc_id),
         |base AS (SELECT doc_id, lang,
         |           list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS t,
         |           text
         |         FROM d2),
         |m AS (SELECT doc_id, lang, text,
         |        CAST(len(t) AS BIGINT) AS n_tokens,
         |        CASE WHEN len(t) > 0
         |             THEN list_reduce(list_transform(t, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
         |             ELSE 0.0 END AS tok_chars,
         |        CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
         |      FROM base),
         |sc AS (SELECT doc_id, lang, text, n_tokens,
         |         CAST(floor((0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |                   + 0.3 * COALESCE(CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0)
         |                   + 0.3 * least(COALESCE(tok_chars / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0) / 10.0, 1.0))
         |                   * 10000 + 0.5) AS BIGINT) AS score_1e4
         |       FROM m),
         |surv AS (SELECT * FROM sc WHERE score_1e4 >= 5000),
         |evt AS (SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                                  x -> x <> ''), w -> $strHashSqlW) AS th
         |        FROM documents WHERE doc_id % 10 = 7),
         |ev AS (SELECT DISTINCT list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS eh
         |       FROM evt, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |st AS (SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                                 x -> x <> ''), w -> $strHashSqlW) AS th
         |       FROM surv),
         |ssp AS (SELECT DISTINCT doc_id,
         |          list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |        FROM st, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |contam AS (SELECT DISTINCT doc_id FROM ssp WHERE h IN (SELECT eh FROM ev)),
         |clean AS (SELECT s2.* FROM surv s2 ANTI JOIN contam c ON s2.doc_id = c.doc_id),
         |sp AS (SELECT lang, n_tokens, doc_id,
         |         ((doc_id % 1000000007) * 40503 + 17) % 1000000007 % 1000 AS b
         |       FROM clean)
         |SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split,
         |       lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tok,
         |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q109: pmod on both sides (the q92 convention) and the interleave
    // generated from the same zValueNSql term list.
    "q109_zorder3" ->
      s"""WITH b AS (SELECT ((user_id % 64) + 64) % 64 AS x,
         |                  ((event_id % 64) + 64) % 64 AS y,
         |                  (((user_id + event_id) % 64) + 64) % 64 AS w
         |           FROM events),
         |z AS (SELECT x, y, w,
         |        ${graft.operators.ZOrder.zValueNSql(Seq("x", "y", "w"), 6)} AS z
         |      FROM b)
         |SELECT z // 4096 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(x) AS min_x, MAX(x) AS max_x,
         |       MIN(y) AS min_y, MAX(y) AS max_y,
         |       MIN(w) AS min_w, MAX(w) AS max_w
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    "q104_mixture_sample" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
        |r AS (SELECT lang, n,
        |        CAST((SELECT MIN(n) FROM c) * 1000000 // n AS BIGINT) AS rate_1e6
        |      FROM c),
        |k AS (SELECT d.lang, d.doc_id FROM documents d JOIN r ON d.lang = r.lang
        |      WHERE ((d.doc_id % 1000000007) * 40503 + 17) % 1000000007 % 1000000 < r.rate_1e6)
        |SELECT r.lang, r.n AS n_before, r.rate_1e6,
        |       CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
        |       CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS sum_kept_ids
        |FROM r LEFT JOIN k ON r.lang = k.lang
        |GROUP BY r.lang, r.n, r.rate_1e6 ORDER BY r.lang""".stripMargin,

    "q105_reservoir_per_group" ->
      """WITH p AS (SELECT lang, doc_id,
        |             CAST(((doc_id % 1000000007) * 40503 + 17) % 1000000007 AS BIGINT) AS priority
        |           FROM documents),
        |rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |                   ORDER BY priority, doc_id) AS rn FROM p)
        |SELECT lang, doc_id, priority FROM rr WHERE rn <= 25
        |ORDER BY lang, priority, doc_id""".stripMargin,

    // q103: the same stage algebra as q100's oracle, but labeling every
    // corpus doc with its first dropping stage instead of keeping only
    // survivors — the 'kept' row must equal q100's totals.
    "q103_pipeline_audit" ->
      s"""WITH tok AS (SELECT doc_id, text,
         |          list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS t
         |        FROM documents),
         |m AS (SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
         |        CASE WHEN len(t) > 0
         |             THEN list_reduce(list_transform(t, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
         |             ELSE 0.0 END AS tok_chars,
         |        CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
         |      FROM tok),
         |sc AS (SELECT doc_id, text, n_tokens,
         |         CAST(floor((0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |                   + 0.3 * COALESCE(CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0)
         |                   + 0.3 * least(COALESCE(tok_chars / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0) / 10.0, 1.0))
         |                   * 10000 + 0.5) AS BIGINT) AS score_1e4
         |       FROM m),
         |corpus AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |           FROM sc WHERE doc_id % 10 <> 7),
         |surv AS (SELECT * FROM corpus WHERE rn = 1 AND score_1e4 >= 5000),
         |evt AS (SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                                  x -> x <> ''), w -> $strHashSqlW) AS th
         |        FROM documents WHERE doc_id % 10 = 7),
         |ev AS (SELECT DISTINCT list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS eh
         |       FROM evt, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |st AS (SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                                 x -> x <> ''), w -> $strHashSqlW) AS th
         |       FROM surv),
         |ssp AS (SELECT DISTINCT doc_id,
         |          list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |        FROM st, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |contam AS (SELECT DISTINCT doc_id FROM ssp WHERE h IN (SELECT eh FROM ev)),
         |lab AS (
         |  SELECT CASE WHEN rn <> 1 THEN 'exact_dedup'
         |              WHEN COALESCE(score_1e4, -1) < 5000 THEN 'quality'
         |              WHEN doc_id IN (SELECT doc_id FROM contam) THEN 'decontamination'
         |              ELSE 'kept' END AS stage,
         |         COALESCE(n_tokens, 0) AS nt
         |  FROM corpus
         |  UNION ALL
         |  SELECT 'eval_holdout' AS stage, COALESCE(n_tokens, 0) AS nt
         |  FROM sc WHERE doc_id % 10 = 7)
         |SELECT CAST(CASE stage WHEN 'eval_holdout' THEN 1 WHEN 'exact_dedup' THEN 2
         |                       WHEN 'quality' THEN 3 WHEN 'decontamination' THEN 4
         |                       ELSE 5 END AS BIGINT) AS stage_idx,
         |       stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(nt) AS BIGINT) AS sum_tok
         |FROM lab GROUP BY stage ORDER BY 1""".stripMargin,

    "q98_chunk_stride" ->
      s"""WITH t AS (SELECT doc_id,
         |             list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                        x -> x <> ''), w -> $strHashSqlW) AS th
         |           FROM documents WHERE doc_id < 300),
         |n AS (SELECT doc_id, th, CAST(len(th) AS BIGINT) AS n_tok FROM t
         |      WHERE len(th) > 0),
         |c AS (SELECT doc_id, n_tok, th, u.k AS k
         |      FROM n, unnest(range(0, (n_tok + 47) // 48)) u(k))
         |SELECT doc_id, n_tok, CAST(k AS BIGINT) AS chunk_idx,
         |       CAST(least(64, n_tok - k * 48) AS BIGINT) AS chunk_len,
         |       CAST(list_reduce(
         |         list_concat([CAST(0 AS BIGINT)],
         |                     th[k * 48 + 1 : k * 48 + least(64, n_tok - k * 48)]),
         |         (a, b) -> (a * 8191 + b) % 1000000007) AS BIGINT) AS chunk_fp
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // q92: the interleave is the SAME generated bit-algebra expression
    // on both sides (ZOrder.zValueSql == ZOrder.zValue term by term),
    // and the bucketing twin is pmod on BOTH sides — DuckDB's % follows
    // the sign, so the oracle spells pmod as ((e % m) + m) % m; the
    // twins are algebraically identical for any id sign, not merely on
    // the fixture's non-negative domain (r8 advisory), and ZValue's
    // non-negative input precondition holds by construction.
    "q92_zorder_layout" ->
      s"""WITH b AS (SELECT ((user_id % 256) + 256) % 256 AS x,
         |                  ((event_id % 256) + 256) % 256 AS y FROM events),
         |z AS (SELECT x, y, ${graft.operators.ZOrder.zValueSql("x", "y", 8)} AS z
         |      FROM b)
         |SELECT z // 256 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(x) AS min_x, MAX(x) AS max_x,
         |       MIN(y) AS min_y, MAX(y) AS max_y
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    "q148_hilbert_layout" ->
      s"""WITH h0 AS (SELECT ((user_id % 256) + 256) % 256 AS ox,
         |                   ((event_id % 256) + 256) % 256 AS oy,
         |                   ((user_id % 256) + 256) % 256 AS hx,
         |                   ((event_id % 256) + 256) % 256 AS hy,
         |                   CAST(0 AS BIGINT) AS hd
         |            FROM events),
         |${graft.functions.HilbertValue.hilbertCtes(8, "ox, oy,")}
         |SELECT hd // 256 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(ox) AS min_x, MAX(ox) AS max_x,
         |       MIN(oy) AS min_y, MAX(oy) AS max_y
         |FROM h8 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_split_assign" ->
      """WITH b AS (SELECT ((doc_id % 1000000007) * 40503 + 17) % 1000000007 % 1000 AS b, n_chars
        |           FROM documents)
        |SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q84_mixture_weights" ->
      """WITH t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                                      x -> x <> ''))) AS BIGINT) AS n_tok
        |           FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tok,
        |               CAST(COUNT(*) AS BIGINT) AS n_langs FROM t)
        |SELECT lang, n_docs, n_tok,
        |  CAST(total_tok // n_langs AS BIGINT) AS target_tok,
        |  CAST(floor(LEAST(1.0, CAST(total_tok // n_langs AS DOUBLE) / CAST(n_tok AS DOUBLE))
        |    * 10000 + 0.5) AS BIGINT) AS w_1e4,
        |  CAST(floor(CAST(n_tok AS DOUBLE)
        |    * LEAST(1.0, CAST(total_tok // n_langs AS DOUBLE) / CAST(n_tok AS DOUBLE))
        |    + 0.5) AS BIGINT) AS exp_tok
        |FROM t, tot ORDER BY lang""".stripMargin,

    "q86_quantile_filter" ->
      """WITH t AS (SELECT doc_id, lang,
        |             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                                  x -> x <> '')) AS BIGINT) AS n_tok
        |           FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT lang, n_tok,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tok) AS rn,
        |        COUNT(*) OVER (PARTITION BY lang) AS n
        |      FROM t),
        |th AS (SELECT lang,
        |         MAX(CASE WHEN rn = CAST(ceil(0.1 * n) AS BIGINT) THEN n_tok END) AS p10,
        |         MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_tok END) AS p90
        |       FROM r GROUP BY lang)
        |SELECT t.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       CAST(SUM(n_tok) AS BIGINT) AS kept_tok,
        |       CAST(MAX(p10) AS BIGINT) AS p10, CAST(MAX(p90) AS BIGINT) AS p90
        |FROM t JOIN th ON t.lang = th.lang
        |WHERE n_tok >= p10 AND n_tok <= p90
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin,

    "q47_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                                  x -> x <> '')) AS BIGINT) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM t)
        |SELECT CAST(floor(cum_before / 512) AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        |FROM c GROUP BY 1 ORDER BY 1 LIMIT 200""".stripMargin,

    "q66_packing_sharded" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                                  x -> x <> '')) AS BIGINT) AS n_tok,
        |             ((doc_id % 1000000007) * 40503 + 17) % 1000000007 % 8 AS shard
        |           FROM documents),
        |c AS (SELECT shard, doc_id, n_tok,
        |        COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM t)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |       CAST(floor(cum_before / 512) AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 400""".stripMargin,

    "q48_pii_scan" ->
      """WITH f AS (SELECT source,
        |  CASE WHEN regexp_matches(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+') THEN 1 ELSE 0 END AS f_email,
        |  CASE WHEN regexp_matches(lower(text), '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]') THEN 1 ELSE 0 END AS f_phone,
        |  CASE WHEN regexp_matches(lower(text), 'https?://') THEN 1 ELSE 0 END AS f_url
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(f_email) AS BIGINT) AS n_email,
        |       CAST(SUM(f_phone) AS BIGINT) AS n_phone,
        |       CAST(SUM(f_url) AS BIGINT) AS n_url
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q74_pii_redact" ->
      """WITH r AS (SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS n_email,
        |  len(regexp_extract_all(lower(text), '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]')) AS n_phone,
        |  len(regexp_extract_all(lower(text), 'https?://[^ ]+')) AS n_url,
        |  regexp_replace(regexp_replace(regexp_replace(lower(text),
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+', '<email>', 'g'),
        |      '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]', '<phone>', 'g'),
        |      'https?://[^ ]+', '<url>', 'g') AS red
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
        |       CAST(n_phone AS BIGINT) AS n_phone, CAST(n_url AS BIGINT) AS n_url,
        |       CAST(length(red) AS BIGINT) AS redacted_len,
        |       sha256(red) AS redacted_sha
        |FROM r ORDER BY doc_id""".stripMargin
  )
}
