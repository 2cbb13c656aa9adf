package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Canon, Tables}
import Canon._

/** Document deduplication suite (north-star): exact hash dedup, n-gram
  * Jaccard, MinHash+LSH, SimHash. All hashing is engine-portable (token-id
  * polynomial hashes mod 1e9+7 / LCGs mod 2^31-1 in BIGINT range) so the
  * DuckDB oracle reproduces results bit-for-bit.
  *
  * Scale design: shingling/minhashing is per-row narrow work (token and
  * shingle identity are direct polynomial string hashes — NO vocabulary
  * or global structure exists anywhere); the only wide ops are (a)
  * hash-partitioned groupBys on doc_id/shingle, (b) the LSH band-bucket
  * self-join — which is
  * exactly the point: candidates come from equality on (band, signature),
  * never from an O(n²) comparison. The exact n-gram query carries an
  * explicit doc_id bound as its scale guard; MinHash+LSH is the 100 TB
  * path.
  */
object DedupQueries extends QueryGroup {

  import graft.operators.TextDedup
  import TextDedup.{HashParams, tokenHashes}

  /** Scale-adaptive corpus bound for the pairwise dedup family
    * (q32/q33/q56/q69/q75/q90/q96/q101/q151): `max(2000, (max_id+1)/5)`
    * — at the shipped SFs (max doc_id ≤ 4999) this is exactly the
    * historical literal 2000, so sf0.01/sf0.1 hashes are unchanged;
    * on a scaled corpus (tools/scale_gen.py id-offset copies, 1M apart)
    * it grows to the first ~20% of doc ids, so the family the project
    * is named for is finally measurable in the 10×/20× pairs instead of
    * being pinned to copy 0 (r11 verdict item 2). The oracle twin is
    * [[dedupBoundSql]] — the same arithmetic as a scalar subquery, so
    * both engines cut the identical corpus at any scale. Computed once
    * per (session, dataset) from the doc_id column only (columnar
    * scan, ~ms) and memoized so warm bench runs don't re-pay the job;
    * the resulting literal keeps the parquet filter pushdown a join- or
    * subquery-shaped bound would lose. */
  private val dedupBounds =
    new java.util.LinkedHashMap[(SparkSession, String), java.lang.Long](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), java.lang.Long]): Boolean =
        size() > 8
    }

  private def dedupBound(s: SparkSession, d: String): Long =
    dedupBounds.synchronized {
      Option(dedupBounds.get((s, d))).map(_.longValue()).getOrElse {
        val row = Tables.documents(s, d).agg(max(col("doc_id"))).head()
        val mx = if (row.isNullAt(0)) 0L else row.getLong(0)
        val b = math.max(2000L, (mx + 1L) / 5L)
        dedupBounds.put((s, d), b)
        b
      }
    }

  /** DuckDB twin of [[dedupBound]] — identical arithmetic, scalar
    * subquery form (`//` floor-division equals Spark's truncating `/`
    * for the non-negative ids here). */
  private val dedupBoundSql =
    "greatest(2000, (SELECT (MAX(doc_id) + 1) // 5 FROM documents))"

  /** q101's persisted profile store, built ONCE per (session, dataset)
    * with TWO appends (base corpus, then a later-ingested batch) so the
    * query genuinely reads base+delta from disk — the StreamTwins
    * .landedLakes caching physics (bounded LRU; the key strongly
    * references its SparkSession). A bench rerun re-READS the store; it
    * does not re-profile the corpus — exactly the operational contract
    * the store exists to provide. */
  private val profileStores =
    new java.util.LinkedHashMap[(SparkSession, String), String](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), String]): Boolean =
        size() > 8
    }

  /** One-time q101 store-build wall-clock, surfaced by Bench as
    * elapsed_profile_store_sec (the q87 landing-leg pattern: one-time
    * setup legs are excluded from per-query numbers but recorded in the
    * round artifact, never hidden). */
  @volatile var profileStoreElapsedSec: Option[Double] = None

  /** q110's persisted span store — same caching physics and two-append
    * build (base + later batch) as [[storedRefProfile]]. */
  private val spanStores =
    new java.util.LinkedHashMap[(SparkSession, String), String](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), String]): Boolean =
        size() > 8
    }

  private def storedHistorySpans(s: SparkSession, d: String): String =
    spanStores.synchronized { Option(spanStores.get((s, d))).getOrElse {
      val path = java.nio.file.Files.createTempDirectory("graft-q110").toString
      val hist = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") % 5 =!= 0))
      graft.operators.SpanStore.append(hist.filter(col("doc_id") % 7 =!= 3), 5, path)
      graft.operators.SpanStore.append(hist.filter(col("doc_id") % 7 === 3), 5, path)
      spanStores.put((s, d), path)
      path
    }}

  /** q111's COMPACTED span store — same two-append build as q110's,
    * then one [[graft.operators.SpanStore.compact]] (distinct-rewrite +
    * pointer swing + delta drop). Separate cache key so q110 keeps
    * reading a raw base∪delta store and q111 a compacted one — the two
    * must hash-match the same oracle regardless of which ran first.
    * The shrink is recorded for the bench artifact (cross-batch
    * duplicate hashes are exactly what compaction removes). */
  @volatile var spanStoreCompactShrink: Option[(Long, Long)] = None
  @volatile var spanStoreElapsedSec: Option[Double] = None

  private def storedHistorySpansCompacted(s: SparkSession, d: String): String =
    spanStores.synchronized { Option(spanStores.get((s, d + "#compacted"))).getOrElse {
      val path = java.nio.file.Files.createTempDirectory("graft-q111").toString
      val hist = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") % 5 =!= 0))
      val t0 = System.nanoTime()
      graft.operators.SpanStore.append(hist.filter(col("doc_id") % 7 =!= 3), 5, path)
      graft.operators.SpanStore.append(hist.filter(col("doc_id") % 7 === 3), 5, path)
      spanStoreCompactShrink = Some(graft.operators.SpanStore.compact(s, path))
      spanStoreElapsedSec = Some((System.nanoTime() - t0) / 1e9)
      spanStores.put((s, d + "#compacted"), path)
      path
    }}

  /** q151's persisted cluster store — same caching physics as the
    * profile/span stores: built ONCE per (session, dataset) as
    * history-CC + ONE incremental delta merge, so a bench rerun
    * re-READS labels (one base scan + a broadcast remap lookup); it
    * never re-runs components over history. */
  @volatile var clusterStoreElapsedSec: Option[Double] = None

  private def storedClusters(s: SparkSession, d: String): String =
    spanStores.synchronized { Option(spanStores.get((s, d + "#clusters"))).getOrElse {
      val path = java.nio.file.Files.createTempDirectory("graft-q151").toString
      val docs = Tables.spread(Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d)))
      val hist = docs.filter(col("doc_id") % 5 =!= 0)
      val delta = docs.filter(col("doc_id") % 5 === 0)
      val t0 = System.nanoTime()
      graft.operators.ClusterStore.build(
        TextDedup.nearDupPairs(hist, 3000L), "d1", "d2", path)
      // the delta's new pairs: delta×delta from the batch itself,
      // delta×history through the SAME band/profile machinery the
      // profile store serves at ingest (q90/q101) — history text is
      // touched only for band-matching docs, never re-clustered
      val dd = TextDedup.nearDupPairs(delta, 3000L)
        .select(col("d1"), col("d2"))
      val dh = TextDedup.nearDupAgainst(delta, hist, 3000L)
        .select(col("doc_id").as("d1"), col("ref_doc_id").as("d2"))
      graft.operators.ClusterStore.applyDelta(s, path, dd.union(dh), "d1", "d2")
      clusterStoreElapsedSec = Some((System.nanoTime() - t0) / 1e9)
      spanStores.put((s, d + "#clusters"), path)
      path
    }}

  private def storedRefProfile(s: SparkSession, d: String): String =
    profileStores.synchronized { Option(profileStores.get((s, d))).getOrElse {
      val path = java.nio.file.Files.createTempDirectory("graft-q101").toString
      val ref = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") < dedupBound(s, d) && col("doc_id") % 5 =!= 0))
      // base corpus first, then a "later crawl" batch MERGEd in — the
      // split is arbitrary (any partition of ref works; the store is
      // append-only over doc_id-disjoint batches)
      val t0 = System.nanoTime()
      graft.operators.ProfileStore.append(ref.filter(col("doc_id") % 7 =!= 3), path)
      graft.operators.ProfileStore.append(ref.filter(col("doc_id") % 7 === 3), path)
      profileStoreElapsedSec = Some((System.nanoTime() - t0) / 1e9)
      profileStores.put((s, d), path)
      path
    }}

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group on content hash (sha2 — at 100 TB you never
    // shuffle full text, only the 32-byte digest), keep min doc_id.
    "q31_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(sha2(col("text"), 256).as("th"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))),

    // Exact pairwise n-gram Jaccard over shared-shingle candidates,
    // computed on the library's hashed shingle set (TextDedup
    // .shingleHashes — same identities as the MinHash path, so only
    // 16-byte (doc_id, h) rows ever join or shuffle, never shingle
    // strings). The shingle set feeds three consumers (both self-join
    // sides + the per-doc sizes); the eager localCheckpoint runs the
    // tokenize/hash subtree once for all three WITHOUT registering in
    // the CacheManager — blocks are ContextCleaner-freed when the
    // result goes unreachable, so repeated runs hold flat storage
    // memory. localCheckpoint preserves the physical partitioning, so
    // both self-join sides read the same HashPartitioning(h, 32)
    // (alias-tracked through the h2 rename) and the O(candidate-pairs)
    // probe runs on every core with no further exchange.
    "q32_dedup_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.spread(
        Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d)))
      // (Measured dead end, round 4: computing `n` in-row as size(hs)
      // before the explode re-evaluates the interpreted HOF shingle
      // array 2-3× per row via filter pushdown + project collapsing —
      // 6.9 s vs 1.5 s. The explode+groupBy codegen stream stays.)
      val sh = TextDedup.shingleHashes(docs)
        .repartition(32, col("h"))
        .localCheckpoint(eager = true)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // Sizes ride along on BOTH probe sides (broadcast dim onto the
      // h-partitioned shingle stream — narrow, partitioning preserved),
      // so the length-ratio bound prunes INSIDE the self-join, before
      // the O(candidate-pairs) groupBy shuffle: J = inter/union ≤
      // min(n)/max(n), and the ≥3000 output filter admits J ≥ 0.29995
      // after rounding, so a pair with min·100000 < 29995·max can't
      // reach the threshold — exact integer arithmetic, answer
      // unchanged. (An LSH-candidate intersection would NOT be answer-
      // preserving: band candidates are recall-lossy. Prefix filtering
      // was measured on this corpus and rejected: 82% of ALL doc pairs
      // share a shingle — candidates drop only 1.65M→1.3M while adding
      // per-pair array verification.) Carrying n1/n2 through the
      // aggregation drops the two post-agg dim joins of the r3 form.
      val a = sh.join(broadcast(sizes), "doc_id")
        .select(col("doc_id").as("d1"), col("h"), col("n").as("n1"))
      val b = sh.join(broadcast(sizes), "doc_id")
        .select(col("doc_id").as("d2"), col("h").as("h2"), col("n").as("n2"))
      a.join(b, col("h") === col("h2") && col("d1") < col("d2") &&
          least(col("n1"), col("n2")) * 100000L >=
            greatest(col("n1"), col("n2")) * 29995L)
        // The pair aggregation is this suite's LARGEST exchange (~5.4M
        // probe rows → ~1.4M distinct pairs at sf0.1) — size it to the
        // executor cores (defaultParallelism, the Tables.spread
        // convention) instead of the session's small-query shuffle
        // width. Measured single-session alternating A/B: ~25% faster
        // than the 4-partition bench default; the explicit hash
        // partitioning on (d1, d2) also satisfies the aggregation's
        // required distribution, so no second exchange exists.
        // r15: only the 16-byte (d1, d2) key crosses the pair exchange —
        // n1/n2 still gate the prune inside the join condition above,
        // but they re-attach AFTER the aggregation as two broadcast
        // joins of the doc-sized dim onto the distinct-pair stream
        // (sizes is 1/5-of-corpus doc-grain — broadcast by the same
        // budget as the probe-side attach). Halves the shuffled row
        // width of the query's largest exchange (339 M candidate rows
        // at 50×): Jaccard32Probe interleaved A/B — −27% at 50×
        // (120.5→85.2 s), −12% at 10× (12.7→11.3), tie at sf0.1. The
        // r3-era objection to post-agg dim joins was about SHUFFLE
        // joins; these are broadcasts over the already-aggregated
        // distinct pairs.
        .select(col("d1"), col("d2"))
        .repartition(s.sparkContext.defaultParallelism, col("d1"), col("d2"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("doc_id").as("d1"), col("n").as("n1"))), "d1")
        .join(broadcast(sizes.select(col("doc_id").as("d2"), col("n").as("n2"))), "d2")
        .select(col("d1"), col("d2"),
          ratio1e4(col("inter").cast("double") /
            (col("n1") + col("n2") - col("inter")).cast("double")).as("jacc_1e4"))
        .filter(col("jacc_1e4") >= 3000)
        .orderBy(col("d1"), col("d2"))
    }),

    // MinHash + LSH: 8 permutations, 4 bands × 2 rows; candidates from
    // band-signature equality, then exact-Jaccard verification. The
    // whole pipeline is the library operator TextDedup.nearDupPairs —
    // this oracle query hash-verifies the library path each round.
    "q33_dedup_minhash_lsh" -> ((s, d) =>
      TextDedup.nearDupPairs(
          Tables.spread(Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d))), 3000L)
        .orderBy(col("d1"), col("d2"))),

    // Stream-static dedup-on-ingest, batch twin (r7 verdict item 8):
    // TextDedup.nearDupAgainst checks an INCOMING document stream
    // against a STATIC reference corpus — in-row shingles + minhash
    // minima on the stream side (no stream-side aggregation, so the
    // true streaming form is append-mode safe; TextDedupSpec exercises
    // it), band-signature equality against the corpus profile for
    // candidates, per-doc profile lookup for exact-Jaccard verify.
    // Here the corpus splits 1:4 into ingest/reference twins and the
    // SAME oracle algebra recomputes the cross join of band-equal
    // (stream, corpus) pairs. nearDupAgainst emits one row per
    // matching band by contract; the declared-exactly-once form is
    // distinct(), matching the oracle's DISTINCT candidates.
    "q90_neardup_ingest" -> ((s, d) => {
      val docs = Tables.spread(
        Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d)))
      TextDedup.nearDupAgainst(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0), 3000L)
        .distinct()
        .orderBy(col("doc_id"), col("ref_doc_id"))
    }),

    // Dedup-on-ingest against the PERSISTED profile store (r8 verdict
    // item 5 — the operational 100 TB form of q90): the reference
    // corpus's band/minhash profile is parquet on disk, built by two
    // ProfileStore.append calls (base + a later-ingested delta, cost
    // tracking each batch, never the accumulated corpus), and the
    // incoming stream probes the READ-BACK profile. Hash-must-equal
    // q90's from-scratch algebra — same oracle twin.
    "q101_neardup_profile_store" -> ((s, d) => {
      val stream = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") < dedupBound(s, d) && col("doc_id") % 5 === 0))
      val prof = graft.operators.ProfileStore.read(s, storedRefProfile(s, d))
      graft.operators.ProfileStore.nearDupAgainstProfile(stream, prof, 3000L)
        .distinct()
        .orderBy(col("doc_id"), col("ref_doc_id"))
    }),

    // Incremental exact-substring SCRUB on ingest (round 9; composes
    // q91's destructive rewrite with the q101/SpanStore persistence):
    // the history corpus's distinct 5-token span hashes live in a
    // persisted store (two blind appends — base + later batch; 8-byte
    // rows, h-repartitioned, cost tracks each batch); every incoming
    // doc's span that collides with the store drops its covered tokens
    // and survivors re-join. The history is never rescanned — q91's
    // first-occurrence-wins replays batch by batch.
    "q110_substring_scrub_ingest" -> ((s, d) => {
      val incoming = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0))
      TextDedup.removeStoredSpans(incoming, 5,
          graft.operators.SpanStore.read(s, storedHistorySpans(s, d)))
        .orderBy(col("doc_id"))
    }),

    // q110 through a COMPACTED store (round 9; the store's operational
    // cadence): same two-append build, then SpanStore.compact — the
    // distinct-rewrite + atomic pointer swing + delta drop that keeps
    // the probe's build side at DISTINCT spans while ingest accumulates
    // cross-batch duplicates. Must hash-match q110's oracle verbatim:
    // membership is duplicate-insensitive, so compaction is answer-
    // preserving by construction, and this query keeps it under the
    // gate every round.
    "q111_scrub_compacted_store" -> ((s, d) => {
      val incoming = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0))
      TextDedup.removeStoredSpans(incoming, 5,
          graft.operators.SpanStore.read(s, storedHistorySpansCompacted(s, d)))
        .orderBy(col("doc_id"))
    }),

    // Exact-substring REMOVAL (q68 reports duplicate-span stats; this
    // one rewrites the corpus — the destructive Lee-et-al.-2021 step):
    // every 5-token span occurring twice anywhere keeps only its first
    // occurrence in (doc_id, position) log order, covered tokens of
    // later occurrences are dropped, survivors re-join into clean_text.
    // Library operator TextDedup.removeDuplicateSpans; the oracle
    // recomputes the identical rewrite in DuckDB, hash-comparing the
    // full cleaned text of every doc. Only 16-byte (h, k) occurrence
    // rows shuffle; the rewrite is an in-row HOF on the original row.
    "q91_substring_removal" -> ((s, d) =>
      TextDedup.removeDuplicateSpans(
          Tables.spread(Tables.documents(s, d)), 5)
        .orderBy(col("doc_id"))),

    // Duplicate-cluster resolution: connected components over the
    // verified MinHash+LSH near-dup pairs (transitive closure — A~B~C
    // collapses to one cluster even though A,C never compared). Library
    // operator GraphDedup: iterative min-label propagation, one
    // join+groupBy shuffle per round, O(diameter) rounds.
    "q56_dedup_components" -> ((s, d) => {
      val pairs = TextDedup.nearDupPairs(
        Tables.spread(Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d))), 3000L)
      graft.operators.GraphDedup.connectedComponents(pairs, "d1", "d2")
        .groupBy(col("component")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("component"))
    }),

    // Cross-SOURCE span-overlap matrix (round 8; dataset governance:
    // which ingest sources share content — licensing leaks, mirror
    // detection, double-counting before mixture weighting). Distinct
    // (source, h) span sets — 24-byte rows, one distinct shuffle —
    // then an equality self-join on the span hash and a pair count.
    // Output is |sources|² bounded, never corpus-sized.
    "q97_source_overlap" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      // one corpus pass: the distinct span set is h-partitioned and
      // checkpointed once (q32/q91 pattern), so both self-join sides
      // read co-partitioned blocks with zero further exchange
      val sp0 = docs.select(col("source"), explode(
          graft.functions.TokenSpanHashes.tokenSpanHashes(
            TextDedup.toks(col("text")), 5)).as("h"))
        .distinct()
        .repartition(s.sparkContext.defaultParallelism, col("h"))
        .localCheckpoint(eager = true)
      // COST-GATED CountFloor pre-kill (r13, verdict item 7 — the q121
      // discipline's second adopter): a span hash appearing ONCE in the
      // distinct (source, h) set can't produce a pair, so floor=2 kills
      // it on BOTH join sides before the probe. The build pass is one
      // narrow re-read of the checkpoint (NOT a generator re-run — the
      // q32 attempt re-ran the self-join for its build and lost 2.5×,
      // PrekillProbe r13); measured 1.24 s ON vs 1.80 s OFF at the 10×
      // corpus (-31%). Answer-identical: the sketch only over-counts,
      // so only can't-pair rows die. Below the gate the sketch pass
      // costs more than the small join it prunes.
      val nSp = sp0.count()
      val minRows = s.conf.getOption("spark.graft.overlap.prekillMinRows")
        .map(_.toLong).getOrElse(2000000L)
      val sp =
        if (nSp >= minRows) {
          val sk = graft.operators.CountFloor.sketch(sp0, "h",
            math.min(nSp, graft.operators.CountFloor.maxKeysFor()))
          sp0.filter(graft.operators.CountFloor.atLeast(sk, col("h"), 2))
        } else sp0
      val a = sp.select(col("source").as("source_a"), col("h"))
      val b = sp.select(col("source").as("source_b"), col("h").as("h2"))
      a.join(b, col("h") === col("h2") && col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Quality-aware duplicate-cluster resolution (round 8): q69 keeps
    // the MIN-ID doc per near-dup cluster; real pipelines keep the
    // BEST doc — here the q38 quality score (fixed-point 1e4, so the
    // argmax is integer-deterministic across engines), ties broken by
    // doc_id. Same LSH pairs + connected components; one extra join
    // against the narrow per-doc quality pass and a per-component
    // top-1 window (component-partitioned — never global).
    "q96_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d)))
      val pairs = TextDedup.nearDupPairs(docs, 3000L)
      val comp = graft.operators.GraphDedup.connectedComponents(pairs, "d1", "d2")
      // q38's score algebra (hash-verified there), reduced to the score
      val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
      val quality = docs
        .withColumn("t", TextDedup.toks(col("text")))
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
        .select(col("doc_id"),
          ratio1e4(lit(0.4) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * col("stop_ratio") +
            lit(0.3) * least(col("avg_tok_len") / 10.0, lit(1.0))).as("score_1e4"))
      val w = Window.partitionBy(col("component"))
        .orderBy(col("score_1e4").desc, col("doc_id"))
      comp.select(col("id").as("doc_id"), col("component"))
        .join(quality, "doc_id")
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("component"), col("score_1e4"),
          (col("rn") === 1).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Exact repeated-span detection (the "duplicated 50-token substring"
    // filter of training-data dedup, scaled to 5-token spans for the
    // fixture corpus): rolling polynomial hash of every 5-token window,
    // a span is duplicated when its hash occurs in ≥2 docs. All span
    // hashing is narrow in-row work; the wide ops shuffle only 16-byte
    // (doc_id, h) rows — cross-doc span counts groupBy(h), a semi join
    // back, and the per-doc ratio groupBy.
    "q68_span_dedup" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      // eager localCheckpoint: the tokenize/hash subtree (the query's
      // narrow CPU) runs once for all three consumers (cross-doc span
      // counts, per-doc totals, per-doc dup counts) and is
      // ContextCleaner-freed when the result goes unreachable.
      val spans = TextDedup.spanHashes(docs, 5)
        .localCheckpoint(eager = true)
      val dupH = spans.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("h").as("dh"))
      val perDoc = spans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
      val dupPerDoc = spans.join(dupH, col("h") === col("dh"), "leftsemi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
      perDoc.join(dupPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          ratio1e4(coalesce(col("n_dup"), lit(0L)).cast("double") /
            col("n_spans").cast("double")).as("dup_1e4"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination — the training-side contamination check:
    // for each eval-set document (doc_id ≡ 7 mod 10 stands in for a
    // held-out benchmark at any corpus size), the share of its 5-token
    // spans that appear anywhere in the train split (all other docs). Same narrow span hashing as q68;
    // the wide ops are one distinct on train span hashes and a semi join
    // of eval spans against it — 16-byte rows only, both sides
    // hash-partitioned on the span hash.
    "q70_decontamination" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      val trainH = TextDedup.spanHashes(docs.filter(col("doc_id") % 10 =!= 7), 5)
        .select(col("h").as("th_")).distinct()
      val evalSpans = TextDedup.spanHashes(docs.filter(col("doc_id") % 10 === 7), 5)
      val hits = evalSpans.join(trainH, col("h") === col("th_"), "leftsemi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
      evalSpans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          ratio1e4(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
            col("n_spans").cast("double")).as("contam_1e4"))
        .orderBy(col("doc_id"))
    }),

    // Decontamination through the COST-GATED bloom-prefiltered semi
    // join (SketchFilter.bloomSemiAuto) — same answer as q70 by
    // construction (no false negatives; false positives die in the
    // exact semi join). The 100 TB path: eval spans that cannot hit
    // train are dropped by a codegen sketch probe BEFORE the semi
    // join's shuffle, so the shuffled eval volume shrinks to ~the
    // contamination rate. The oracle is q70's oracle verbatim — one
    // physical plan swap, zero semantic drift, hash-checked. The gate
    // (r4 verdict: the sketch-build pass over train dominated when the
    // whole semi join was half a second — 2.78× vs DuckDB) picks the
    // plain semi join below the probe-size threshold and the sketch
    // above it, where its win term (probe-shuffle volume) lives.
    // Sketch sizing when taken: an undersized Bloom filter only
    // degrades prune selectivity, never correctness, and stays ~1 MB
    // in the task binaries.
    "q76_decontamination_bloom" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      // no eager localCheckpoints here (r5: they cost ~0.3 s of
      // materialization at bench scale — the whole q70 gap — while the
      // gate picks the plain semi anyway, making q76 ≡ q70's plan).
      // When the sketch path IS taken, the shared subtrees dedupe via
      // exchange reuse; the lazy ScalarSubquery contract needs no
      // checkpointed stats (LogicalRDD keeps origin estimates anyway).
      val trainH = TextDedup.spanHashes(docs.filter(col("doc_id") % 10 =!= 7), 5)
        .select(col("h").as("th_")).distinct()
      val evalSpans = TextDedup.spanHashes(docs.filter(col("doc_id") % 10 === 7), 5)
      val hits = graft.operators.SketchFilter.bloomSemiAuto(
          evalSpans, "h", trainH, "th_", expectedItems = 1000000L, fpp = 0.02)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
      evalSpans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          ratio1e4(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
            col("n_spans").cast("double")).as("contam_1e4"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end dedup resolution — the pipeline's final verdict: every
    // doc in the near-dup graph gets its duplicate-cluster label and a
    // keep/drop decision (representative = cluster-min doc_id). Composes
    // nearDupPairs → connectedComponents; docs outside the graph are
    // implicitly kept and never shuffle.
    "q69_dedup_resolution" -> ((s, d) => {
      val pairs = TextDedup.nearDupPairs(
        Tables.spread(Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d))), 3000L)
      graft.operators.GraphDedup.connectedComponents(pairs, "d1", "d2")
        .select(col("id").as("doc_id"), col("component"),
          (col("id") === col("component")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // EXACT repeated-span detection by prefix doubling (round 11 — the
    // collision-FREE completion of the dedup ladder; ExactSpans
    // scaladoc): positions whose verbatim 12-token window repeats
    // corpus-wide, computed through exact equivalence classes (vocab
    // ids + log L dense-pair-id doubling rounds + the two-anchor
    // overlap for ragged L) with no hash anywhere in the decision —
    // the rolling-hash kernel's 30-bit span space saturates at corpus
    // scale, this does not. The ORACLE compares the verbatim window
    // STRINGS in DuckDB, so the hash gate certifies exactness end to
    // end, not hash-identity.
    "q153_exact_repeats" -> ((s, d) => {
      val cls = graft.operators.ExactSpans.windowClasses(
          Tables.spread(Tables.documents(s, d)), "text", 12)
        .localCheckpoint(true) // feeds the dup agg AND the per-doc stats
      val dup = cls.groupBy(col("cls"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
      val perDoc = cls.join(dup, Seq("cls"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          count(col("n_occ")).as("n_dup_pos"),
          coalesce(max(col("n_occ")), lit(0L)).as("max_occ"))
      perDoc.orderBy(col("doc_id"))
    }),

    // INCREMENTAL near-dup cluster maintenance (round 11 operator —
    // the operational gap between q101's profile store and q69's
    // batch-recomputed components): history's clusters persist in a
    // ClusterStore; when the delta batch lands, its verified pairs
    // (delta×delta + delta×history via the q90 band/profile probe)
    // merge ONLY the touched cluster labels — label-level remap rows,
    // never a re-run of components over history. The oracle is q69's
    // from-scratch recursive-CTE closure over the WHOLE corpus
    // verbatim, so the hash gate proves store+delta ≡ from-scratch
    // (the q88/q127/q110 discipline; ClusterStoreSpec pins the law on
    // randomized splits).
    "q151_cluster_incremental" -> ((s, d) =>
      graft.operators.ClusterStore.read(s, storedClusters(s, d))
        .select(col("id").as("doc_id"), col("component"),
          (col("id") === col("component")).as("keep"))
        .orderBy(col("doc_id"))),

    // Asymmetric containment near-dup (sub-document duplication): for
    // LSH band candidates, C(A→B) = |A∩B|/|A| in both directions — a
    // short doc embedded in a long one scores ~1.0 here while Jaccard
    // (diluted by the long doc) misses it. Library operator
    // TextDedup.containmentPairs, same candidates/profile machinery as
    // q33 — only the scoring algebra differs.
    "q75_dedup_containment" -> ((s, d) =>
      TextDedup.containmentPairs(
          Tables.spread(Tables.documents(s, d).filter(col("doc_id") < dedupBound(s, d))), 5000L)
        .orderBy(col("d1"), col("d2"))),

    // SimHash: 62-bit fingerprint from two 31-bit LCGs over the token's
    // portable polynomial string hash; bit b of the fingerprint is set
    // iff the ±1 vote sum over the doc's distinct tokens is positive.
    // No vocabulary exists: token identity is hashed in-row and the
    // in-row array_distinct IS the per-doc distinct-token set, so the
    // ONLY shuffle in the whole query is the groupBy(doc_id) vote agg
    // (map-side partial over the spread scan's 32 partitions).
    "q34_dedup_simhash" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      // distinct token hashes = the w=1 span kernel (codegen; identical
      // first-occurrence distinct as array_distinct∘tokenHashes)
      val th = docs
        .select(col("doc_id"),
          explode(graft.functions.TokenSpanHashes.tokenSpanHashes(
            TextDedup.toks(col("text")), 1)).as("hv"))
        .select(col("doc_id"),
          (((col("hv") * 48271L) % 2147483647L) * 2147483648L +
            ((col("hv") * 69621L) % 2147483647L)).as("h62"))
      // All 62 per-bit vote sums in ONE groupBy(doc_id) pass (62 long
      // aggregate columns) instead of exploding every token hash into 62
      // rows and shuffling the 62x stream twice. Votes and the final
      // fingerprint are bit-identical to the exploded formulation, so
      // the oracle twin (which keeps the readable explode form) holds.
      val bitSums = (0 until 62).map(b =>
        sum(when(expr(s"(shiftright(h62, $b) & 1) = 1"), 1L).otherwise(-1L)).as(s"s$b"))
      val votes = th.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      val fingerprint = (0 until 62).map(b =>
        when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
      votes.select(col("doc_id"), fingerprint.cast("long").as("simhash"))
        .orderBy(col("doc_id"))
    })
  )

  /** Portable polynomial string hash of `w` as a DuckDB lambda body —
    * the q40 rolling-hash pattern, bit-identical to TextDedup.strHash. */
  private val strHashSql: String =
    """list_reduce(list_transform(range(1, length(w) + 1),
      |                           i -> CAST(ascii(w[i]) AS BIGINT)),
      |            (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin

  private val shingleHashSql: String =
    s"""t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                                 x -> x <> '') AS toks
       |      FROM documents WHERE doc_id < $dedupBoundSql),
       |hh AS (SELECT doc_id, list_transform(toks, w -> $strHashSql) AS th
       |       FROM t),
       |sh AS (SELECT DISTINCT doc_id, (th[i] * 8191 + th[i + 1]) % 1000000007 AS h
       |       FROM hh, unnest(range(1, greatest(len(th), 1))) u(i))""".stripMargin

  /** Shared CTE chain for the MinHash+LSH pipeline (q33/q56): shingle
    * hashes → per-permutation minima → band signatures → candidate
    * pairs → exact-Jaccard sizes. `candPred` selects which band-equal
    * pairs are candidates (self-join upper triangle by default; q90
    * passes the stream-vs-corpus split). */
  private def lshCtes(candPred: String = "a.doc_id < b.doc_id"): String = {
    val hkValues = HashParams.map { case (k, a, b) => s"($k, $a, $b)" }.mkString(", ")
    s"""$shingleHashSql,
       |hk(k, a, b) AS (VALUES $hkValues),
       |mh AS (SELECT doc_id, k, MIN((a * h + b) % 1000000007) AS mh
       |       FROM sh, hk GROUP BY 1, 2),
       |bands AS (SELECT doc_id, k // 2 AS band,
       |                 string_agg(CAST(mh AS VARCHAR), '-' ORDER BY k) AS sig
       |          FROM mh GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.sig = b.sig AND $candPred),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.d1, c.d2, COUNT(*) AS inter
       |          FROM cand c JOIN sh s1 ON s1.doc_id = c.d1
       |                      JOIN sh s2 ON s2.doc_id = c.d2 AND s1.h = s2.h
       |          GROUP BY 1, 2)""".stripMargin
  }

  /** Verified near-dup pairs (threshold 0.3, scaled 1e4) over `lshCtes`. */
  private val lshPairsSelect: String =
    """SELECT d1, d2,
      |       CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) AS jacc_1e4
      |FROM inter JOIN sz z1 ON d1 = z1.doc_id JOIN sz z2 ON d2 = z2.doc_id
      |WHERE CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) >= 3000""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q31_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "q32_dedup_ngram_jaccard" ->
      s"""WITH $shingleHashSql,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2,
         |       CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) AS jacc_1e4
         |FROM pairs JOIN sz z1 ON d1 = z1.doc_id JOIN sz z2 ON d2 = z2.doc_id
         |WHERE CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) >= 3000
         |ORDER BY d1, d2""".stripMargin,

    "q33_dedup_minhash_lsh" ->
      s"""WITH ${lshCtes()}
         |$lshPairsSelect
         |ORDER BY d1, d2""".stripMargin,

    // q90 = the SAME LSH algebra with the candidate join split
    // stream-vs-corpus instead of the self-join upper triangle.
    "q90_neardup_ingest" ->
      s"""WITH ${lshCtes("a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0")}
         |SELECT d1 AS doc_id, d2 AS ref_doc_id,
         |       CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) AS jacc_1e4
         |FROM inter JOIN sz z1 ON d1 = z1.doc_id JOIN sz z2 ON d2 = z2.doc_id
         |WHERE CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) >= 3000
         |ORDER BY doc_id, ref_doc_id""".stripMargin,

    // q101 = q90's exact algebra: the profile-store round-trip must not
    // change a single pair, so the oracle is the same SQL.
    "q101_neardup_profile_store" ->
      s"""WITH ${lshCtes("a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0")}
         |SELECT d1 AS doc_id, d2 AS ref_doc_id,
         |       CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) AS jacc_1e4
         |FROM inter JOIN sz z1 ON d1 = z1.doc_id JOIN sz z2 ON d2 = z2.doc_id
         |WHERE CAST(floor(inter * 1.0 / (z1.n + z2.n - inter) * 10000 + 0.5) AS BIGINT) >= 3000
         |ORDER BY doc_id, ref_doc_id""".stripMargin,

    // q110: history = distinct span set of doc_id % 5 <> 0; incoming
    // docs drop every token covered by a store-colliding span and
    // rebuild — q91's rewrite machinery with store membership replacing
    // the non-first-occurrence test.
    "q110_substring_scrub_ingest" ->
      s"""WITH hh0 AS (SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                                       x -> x <> ''), w -> $strHashSql)
         |                       AS th
         |             FROM documents),
         |hist AS (SELECT DISTINCT list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |         FROM (SELECT * FROM hh0 WHERE doc_id % 5 <> 0) hh,
         |              unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |inc AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                   x -> x <> '') AS toks
         |        FROM documents WHERE doc_id % 5 = 0),
         |ih AS (SELECT doc_id, toks, list_transform(toks, w -> $strHashSql) AS th FROM inc),
         |occ AS (SELECT doc_id, u.i - 1 AS pos,
         |          list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |        FROM ih, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |drop0 AS (SELECT DISTINCT doc_id, pos + j AS idx
         |          FROM occ, unnest(range(0, 5)) v(j)
         |          WHERE h IN (SELECT h FROM hist)),
         |tok AS (SELECT doc_id, unnest(toks) AS tok,
         |               unnest(range(0, len(toks))) AS idx
         |        FROM ih),
         |kept AS (SELECT t2.doc_id, t2.tok, t2.idx FROM tok t2
         |         ANTI JOIN drop0 dd ON t2.doc_id = dd.doc_id AND t2.idx = dd.idx),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |               string_agg(tok, ' ' ORDER BY idx) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT ih.doc_id, CAST(len(ih.toks) AS BIGINT) AS n_toks,
         |       CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(reb.clean_text, '') AS clean_text
         |FROM ih LEFT JOIN reb ON ih.doc_id = reb.doc_id
         |ORDER BY ih.doc_id""".stripMargin,

    // q111 = q110's exact algebra: compaction (distinct-rewrite of the
    // store) must not change a single scrubbed token, so the oracle is
    // the same SQL.
    "q111_scrub_compacted_store" ->
      s"""WITH hh0 AS (SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                                       x -> x <> ''), w -> $strHashSql)
         |                       AS th
         |             FROM documents),
         |hist AS (SELECT DISTINCT list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |         FROM (SELECT * FROM hh0 WHERE doc_id % 5 <> 0) hh,
         |              unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |inc AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                   x -> x <> '') AS toks
         |        FROM documents WHERE doc_id % 5 = 0),
         |ih AS (SELECT doc_id, toks, list_transform(toks, w -> $strHashSql) AS th FROM inc),
         |occ AS (SELECT doc_id, u.i - 1 AS pos,
         |          list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |        FROM ih, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |drop0 AS (SELECT DISTINCT doc_id, pos + j AS idx
         |          FROM occ, unnest(range(0, 5)) v(j)
         |          WHERE h IN (SELECT h FROM hist)),
         |tok AS (SELECT doc_id, unnest(toks) AS tok,
         |               unnest(range(0, len(toks))) AS idx
         |        FROM ih),
         |kept AS (SELECT t2.doc_id, t2.tok, t2.idx FROM tok t2
         |         ANTI JOIN drop0 dd ON t2.doc_id = dd.doc_id AND t2.idx = dd.idx),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |               string_agg(tok, ' ' ORDER BY idx) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT ih.doc_id, CAST(len(ih.toks) AS BIGINT) AS n_toks,
         |       CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(reb.clean_text, '') AS clean_text
         |FROM ih LEFT JOIN reb ON ih.doc_id = reb.doc_id
         |ORDER BY ih.doc_id""".stripMargin,

    // q91: positions are 0-based on both sides; canonical order compares
    // doc_id*1e7 + pos exactly like the Spark operator's encoded key.
    "q91_substring_removal" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                      x -> x <> '') AS toks
         |           FROM documents),
         |hh AS (SELECT doc_id, toks, list_transform(toks, w -> $strHashSql) AS th
         |       FROM t),
         |occ AS (SELECT doc_id,
         |          doc_id * 10000000 + (i - 1) AS k,
         |          list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |        FROM hh, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |firsts AS (SELECT h, MIN(k) AS firstk FROM occ GROUP BY h),
         |dup AS (SELECT o.doc_id, o.k % 10000000 AS pos
         |        FROM occ o JOIN firsts f ON o.h = f.h WHERE o.k <> f.firstk),
         |drop0 AS (SELECT DISTINCT doc_id, pos + j AS idx
         |          FROM dup, unnest(range(0, 5)) v(j)),
         |tok AS (SELECT doc_id, unnest(toks) AS tok,
         |               unnest(range(0, len(toks))) AS idx
         |        FROM hh),
         |kept AS (SELECT t2.doc_id, t2.tok, t2.idx FROM tok t2
         |         ANTI JOIN drop0 d ON t2.doc_id = d.doc_id AND t2.idx = d.idx),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |               string_agg(tok, ' ' ORDER BY idx) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT hh.doc_id, CAST(len(hh.toks) AS BIGINT) AS n_toks,
         |       CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept,
         |       COALESCE(reb.clean_text, '') AS clean_text
         |FROM hh LEFT JOIN reb ON hh.doc_id = reb.doc_id
         |ORDER BY hh.doc_id""".stripMargin,

    "q75_dedup_containment" ->
      s"""WITH ${lshCtes()}
         |SELECT d1, d2,
         |       CAST(floor(inter * 1.0 / z1.n * 10000 + 0.5) AS BIGINT) AS cont1_1e4,
         |       CAST(floor(inter * 1.0 / z2.n * 10000 + 0.5) AS BIGINT) AS cont2_1e4
         |FROM inter JOIN sz z1 ON d1 = z1.doc_id JOIN sz z2 ON d2 = z2.doc_id
         |WHERE greatest(CAST(floor(inter * 1.0 / z1.n * 10000 + 0.5) AS BIGINT),
         |               CAST(floor(inter * 1.0 / z2.n * 10000 + 0.5) AS BIGINT)) >= 5000
         |ORDER BY d1, d2""".stripMargin,

    // q76 is the same CONTRACT as q70 through a different physical plan
    // (bloom-prefiltered semi join) — identical oracle by design.
    "q76_decontamination_bloom" -> decontaminationSql,

    "q70_decontamination" -> decontaminationSql,

    "q97_source_overlap" ->
      s"""WITH t AS (SELECT source, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                      x -> x <> '') AS toks
         |           FROM documents),
         |hh AS (SELECT source, list_transform(toks, w -> $strHashSql) AS th
         |       FROM t),
         |sp AS (SELECT DISTINCT source,
         |         list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |       FROM hh, unnest(range(1, greatest(len(th) - 3, 1))) u(i))
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM sp a JOIN sp b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q96 = q69's component closure + q38's fixed-point quality score;
    // keeper = per-component argmax on (score_1e4 desc, doc_id).
    "q96_dedup_keep_best" ->
      s"""WITH RECURSIVE ${lshCtes()},
         |pairs AS ($lshPairsSelect),
         |e2 AS (SELECT d1 AS a, d2 AS b FROM pairs
         |       UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM e2
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
         |          WHERE e.b <> r.a),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component
         |         FROM reach GROUP BY a),
         |base AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS t
         |  FROM documents WHERE doc_id < $dedupBoundSql),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(t) AS BIGINT) AS n_tokens,
         |    CASE WHEN len(t) > 0
         |         THEN list_reduce(list_transform(t, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
         |         ELSE 0.0 END AS tok_chars,
         |    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
         |  FROM base),
         |q AS (
         |  SELECT doc_id,
         |    CAST(floor((0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |              + 0.3 * COALESCE(CAST(n_stop AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0)
         |              + 0.3 * least(COALESCE(tok_chars / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0) / 10.0, 1.0))
         |              * 10000 + 0.5) AS BIGINT) AS score_1e4
         |  FROM m),
         |sc AS (SELECT comp.id AS doc_id, comp.component, q.score_1e4
         |       FROM comp JOIN q ON comp.id = q.doc_id),
         |rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY component
         |                    ORDER BY score_1e4 DESC, doc_id) AS rn
         |       FROM sc)
         |SELECT doc_id, component, score_1e4, rn = 1 AS keep
         |FROM rr ORDER BY doc_id""".stripMargin,

    // q153: VERBATIM window strings (chr(31)-joined so token boundaries
    // can't alias), grouped and counted — certifies the prefix-doubling
    // classes against real string equality, not hashes.
    "q153_exact_repeats" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                                      x -> x <> '') AS toks
        |           FROM documents),
        |w AS (SELECT doc_id, i - 1 AS pos,
        |        array_to_string(toks[i:i+11], chr(31)) AS win
        |      FROM t, unnest(range(1, greatest(len(toks) - 10, 1))) u(i)),
        |g AS (SELECT win, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY win),
        |j AS (SELECT w.doc_id, g.n FROM w JOIN g USING (win))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |       CAST(COALESCE(SUM(CASE WHEN n >= 2 THEN 1 END), 0) AS BIGINT)
        |         AS n_dup_pos,
        |       CAST(COALESCE(MAX(CASE WHEN n >= 2 THEN n END), 0) AS BIGINT)
        |         AS max_occ
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q151 ≡ q69's from-scratch answer by the store+delta law — the
    // oracle is intentionally the SAME full-corpus closure, so any
    // divergence in the incremental path (missed cross pair, stale
    // remap, double-appended vertex) breaks the hash.
    "q151_cluster_incremental" ->
      s"""WITH RECURSIVE ${lshCtes()},
         |pairs AS ($lshPairsSelect),
         |e2 AS (SELECT d1 AS a, d2 AS b FROM pairs
         |       UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM e2
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
         |          WHERE e.b <> r.a),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component
         |         FROM reach GROUP BY a)
         |SELECT id AS doc_id, component, id = component AS keep
         |FROM comp ORDER BY doc_id""".stripMargin,

    "q69_dedup_resolution" ->
      s"""WITH RECURSIVE ${lshCtes()},
         |pairs AS ($lshPairsSelect),
         |e2 AS (SELECT d1 AS a, d2 AS b FROM pairs
         |       UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM e2
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
         |          WHERE e.b <> r.a),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component
         |         FROM reach GROUP BY a)
         |SELECT id AS doc_id, component, id = component AS keep
         |FROM comp ORDER BY doc_id""".stripMargin,

    // Transitive closure of the LSH pair list via a recursive CTE, then
    // min-reachable-id per node = the component label (identical to the
    // Spark min-label-propagation fixpoint).
    "q56_dedup_components" ->
      s"""WITH RECURSIVE ${lshCtes()},
         |pairs AS ($lshPairsSelect),
         |e2 AS (SELECT d1 AS a, d2 AS b FROM pairs
         |       UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM e2
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
         |          WHERE e.b <> r.a),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component
         |         FROM reach GROUP BY a)
         |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin,

    "q68_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                      x -> x <> '') AS toks
         |           FROM documents),
         |hh AS (SELECT doc_id, list_transform(toks, w -> $strHashSql) AS th
         |       FROM t),
         |sp AS (SELECT DISTINCT doc_id,
         |         list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
         |       FROM hh, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(*) >= 2),
         |pd AS (SELECT doc_id, COUNT(*) AS n_spans FROM sp GROUP BY 1),
         |dd AS (SELECT doc_id, COUNT(*) AS n_dup FROM sp
         |       WHERE h IN (SELECT h FROM dup) GROUP BY 1)
         |SELECT pd.doc_id, pd.n_spans,
         |       COALESCE(dd.n_dup, 0) AS n_dup,
         |       CAST(floor(COALESCE(dd.n_dup, 0) * 1.0 / pd.n_spans * 10000 + 0.5) AS BIGINT) AS dup_1e4
         |FROM pd LEFT JOIN dd ON pd.doc_id = dd.doc_id
         |ORDER BY pd.doc_id""".stripMargin,

    "q34_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                                      x -> x <> '') AS toks
         |           FROM documents),
         |tok AS (SELECT DISTINCT doc_id,
         |          unnest(list_transform(toks, w -> $strHashSql)) AS hv
         |        FROM t),
         |th AS (SELECT doc_id,
         |         ((hv * 48271) % 2147483647) * 2147483648 + ((hv * 69621) % 2147483647) AS h62
         |       FROM tok),
        |bb AS (SELECT doc_id, r.range AS b,
        |         SUM(CASE WHEN (h62 >> CAST(r.range AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |       FROM th, range(0, 62) r GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bb GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

  /** Shared by q70 (plain semi join) and q76 (bloom-prefiltered semi
    * join) — identical contract, different physical plan. */
  private lazy val decontaminationSql: String =
    s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                                      x -> x <> '') AS toks
       |           FROM documents),
       |hh AS (SELECT doc_id, list_transform(toks, w -> $strHashSql) AS th
       |       FROM t),
       |sp AS (SELECT DISTINCT doc_id,
       |         list_reduce(th[i:i+4], (a, b) -> (a * 8191 + b) % 1000000007) AS h
       |       FROM hh, unnest(range(1, greatest(len(th) - 3, 1))) u(i)),
       |train AS (SELECT DISTINCT h FROM sp WHERE doc_id % 10 <> 7),
       |ev AS (SELECT doc_id, h FROM sp WHERE doc_id % 10 = 7),
       |hits AS (SELECT doc_id, COUNT(*) AS n_contaminated FROM ev
       |         WHERE h IN (SELECT h FROM train) GROUP BY 1),
       |pd AS (SELECT doc_id, COUNT(*) AS n_spans FROM ev GROUP BY 1)
       |SELECT pd.doc_id, pd.n_spans,
       |       COALESCE(hits.n_contaminated, 0) AS n_contaminated,
       |       CAST(floor(COALESCE(hits.n_contaminated, 0) * 1.0 / pd.n_spans * 10000 + 0.5) AS BIGINT) AS contam_1e4
       |FROM pd LEFT JOIN hits ON pd.doc_id = hits.doc_id
       |ORDER BY pd.doc_id""".stripMargin
}
