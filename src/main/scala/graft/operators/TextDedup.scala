package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Canon.ratio1e4

/** Reusable text-dedup operators over a (doc_id, text) DataFrame — the
  * library form of the dedup suite (SURVEY.md 2.C q31–q33); the oracle
  * query catalog delegates here, so every primitive below is
  * hash-verified against DuckDB at sf0.01 each round.
  *
  * Scale shape: shingling/minhashing is narrow per-row work — token and
  * shingle identities are direct polynomial string hashes (no vocabulary
  * structure of any kind, so nothing global exists to build or
  * broadcast); the only wide ops are the groupBy(doc_id) profile pass and
  * the LSH band-bucket equality self-join (never an O(n²) comparison).
  */
object TextDedup {

  val P = 1000000007L
  // 8 minhash permutations → 4 bands × 2 rows.
  val HashParams: Seq[(Int, Long, Long)] = Seq(
    (0, 1299721L, 7L), (1, 15485863L, 11L), (2, 32452843L, 13L),
    (3, 49979687L, 17L), (4, 67867967L, 19L), (5, 86028121L, 23L),
    (6, 104395301L, 29L), (7, 122949823L, 31L))
  val BandRows = 2
  val Bands: Int = HashParams.size / BandRows

  /** The banding layout as an array of (band, sig) structs, derived from
    * [[HashParams]] — the ONE definition shared by the batch profile path
    * and the streaming side of [[nearDupAgainst]], so a params change
    * can't silently desynchronize their signatures. */
  private[operators] def bandStructs: Column = array(
    (0 until Bands).map(bd => struct(lit(bd).as("band"),
      concat_ws("-",
        (0 until BandRows).map(r => col(s"mh${BandRows * bd + r}")): _*).as("sig"))): _*)

  def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), x => x =!= "")

  /** Exact dedup: one representative (min id) per identical content;
    * only the 32-byte digest ever shuffles, never the text. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    df.withColumn("__h", sha2(col(contentCol), 256))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** 2-gram word shingles as strings, distinct per doc. */
  def shingleStrings(docs: DataFrame): DataFrame =
    docs.withColumn("toks", toks(col("text")))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat_ws(" ", get(col("toks"), i), get(col("toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()

  /** Portable polynomial string hash: fold (h·31 + ascii(c)) mod P over
    * the characters — the q40 rolling-hash pattern, bit-identical to
    * DuckDB's `list_reduce` twin. Token/shingle identity comes straight
    * from the string, so no vocabulary, window, or broadcast dim exists
    * anywhere in the dedup path: at 100 TB there is NO global structure
    * to build — everything up to the per-doc profile groupBy is narrow.
    *
    * Implemented as the native codegen expression
    * [[graft.functions.StrPolyHash]] (tight byte loop) — bit-identical
    * to the interpreted HOF fold for the `[a-z]+` tokens this path
    * hashes (ASCII bytes ≡ ascii() codepoints). */
  def strHash(c: Column): Column = graft.functions.StrPolyHash.strPolyHash(c)

  /** Per-token polynomial hashes for a text column, in token order. */
  def tokenHashes(c: Column): Column = transform(toks(c), t => strHash(t))

  /** Distinct 2-gram shingle hashes per doc from consecutive token-hash
    * pairs: h = (th1·8191 + th2) mod P — portable across engines (th <
    * P ≈ 2^30, so th·8191 + th ≈ 2^43 stays far inside BIGINT). Entirely
    * narrow ZERO-shuffle work: a doc's shingles all live in its own row,
    * so the in-row distinct IS the (doc_id, h) distinct — no cross-row
    * dedup exchange exists at any scale. Implemented as the native
    * codegen kernel [[graft.functions.TokenSpanHashes]] (tight primitive
    * loop, whole-stage-codegen'd) — bit-identical to the interpreted HOF
    * chain it replaced (r4 measured the HOF form at O(n·w) interpreted
    * lambda calls per row). */
  def shingleHashes(docs: DataFrame): DataFrame = spanHashes(docs, 2)

  /** Distinct rolling w-token span hashes per doc: the polynomial fold
    * (h·8191 + th) mod P over each length-`w` token window — the
    * generalized form used by span-level dedup and decontamination
    * (q68/q70). Entirely narrow zero-shuffle work; only 16-byte
    * (doc_id, h) rows ever leave the row. w=2 is exactly the shingle
    * algebra: the leading 0-seed step is identity (0·8191 + th1 = th1). */
  def spanHashes(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TokenSpanHashes.tokenSpanHashes(
        toks(col("text")), w)).as("h"))

  /** [[spanHashes]] over an ALREADY-TOKENIZED array column — callers
    * that tokenized for another stage (e.g. quality scoring) feed the
    * token array straight into the codegen span kernel and skip the
    * second regexp split of the text (identical output: toks ∘ text is
    * exactly what the array holds). */
  def spanHashesOfTokens(docs: DataFrame, toksCol: String, w: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TokenSpanHashes.tokenSpanHashes(
        col(toksCol), w)).as("h"))

  /** Exact-substring removal (the DESTRUCTIVE form of span dedup — q68
    * only reports duplicate-span statistics; this rewrites the text):
    * every w-token span occurring more than once across the corpus keeps
    * exactly its first occurrence (min (doc_id, position) in log order)
    * and every token covered by a non-first occurrence is removed, then
    * each document's surviving tokens are re-joined into cleaned text.
    * The Lee-et-al.-2021 "exact substring deduplication" shape used by
    * RefinedWeb-style pipelines, with span identity by polynomial hash
    * instead of a suffix array — the equality-joinable form.
    *
    * Scale shape: occurrences are 16-byte (h, encoded doc·pos) rows — the
    * text itself never shuffles with them. The canonical pass is one
    * groupBy(h) min; non-first occurrences join back on h (same key, AQE
    * reuses the exchange layout); the drop-set explodes only duplicate
    * occurrences (w× those rows, not the corpus), aggregates to one
    * array per affected doc, and the rewrite is a narrow in-row HOF over
    * the original row's own tokens — no token explode, no text
    * reassembly shuffle beyond the one doc_id join.
    *
    * Position encoding: pos is 0-based; canonical order compares
    * doc_id·10^7 + pos, so per-doc token counts must stay below 10^7
    * and doc_id must sit in [0, Long.MaxValue/10^7) — both loudly
    * guarded (at 100 TB the token bound holds for any sane document;
    * shard first if it doesn't, and re-key ids if they are negative or
    * beyond ~9.2·10^11 — either would corrupt the encoded ordering
    * silently if admitted).
    *
    * Output: (doc_id, n_toks, n_kept, clean_text), one row per input doc
    * (docs shorter than w tokens pass through with no spans removed —
    * note clean_text is still the normalized re-joined token stream,
    * lowercase [a-z]+ tokens single-space-joined, for EVERY doc, so
    * duplicate-free documents are not byte-identical to their input).
    */
  def removeDuplicateSpans(docs: DataFrame, w: Int): DataFrame = {
    val Enc = 10000000L
    // The occurrence stream (the corpus's narrow CPU: tokenize + span
    // hash) feeds BOTH the canonical-min aggregation and the join back
    // — materialize it ONCE, h-partitioned, via the q32 eager
    // localCheckpoint pattern: the span kernel runs a single corpus
    // pass, ONE h-exchange satisfies both consumers' distributions
    // (the groupBy and the join probe), and the blocks are
    // ContextCleaner-freed when the result goes unreachable.
    // (Measured at sf0.1 local: re-computing the subtree per consumer
    // is ~0.5 s cheaper because the kernel is fast and the corpus
    // tiny — but that plan scans the corpus twice and ships the
    // occurrence stream across two exchanges; at 100 TB the single
    // pass + single exchange is strictly less IO on both axes, so the
    // checkpoint form is kept deliberately.)
    val occ = docs
      .select(col("doc_id"), posexplode(
        graft.functions.TokenSpanHashesAll.tokenSpanHashesAll(
          toks(col("text")), w)).as(Seq("pos", "h")))
      .select(col("h"),
        (when(col("doc_id") >= 0 && col("doc_id") < Long.MaxValue / Enc,
            col("doc_id"))
          .otherwise(raise_error(lit(
            s"removeDuplicateSpans: doc_id outside [0, ${Long.MaxValue / Enc})" +
              " — re-key ids first"))) * Enc
          + when(col("pos") < Enc, col("pos"))
          .otherwise(raise_error(lit(
            s"removeDuplicateSpans: a doc has >= $Enc tokens — shard it first")))
        ).as("k"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("h"))
      .localCheckpoint(eager = true)
    val firstK = occ.groupBy(col("h")).agg(min(col("k")).as("firstk"))
    val dropIdx = occ.join(firstK, "h")
      .filter(col("k") =!= col("firstk"))
      .select(expr(s"k div $Enc").as("doc_id"),
        explode(sequence(col("k") % Enc, col("k") % Enc + (w - 1))).as("idx"))
      .distinct()
    rewriteDropping(docs, dropIdx)
  }

  /** The rewrite tail shared by [[removeDuplicateSpans]] and
    * [[removeStoredSpans]]: aggregate the (doc_id, idx) drop set to one
    * sorted array per affected doc and rebuild each doc's text from its
    * OWN token array with a narrow in-row HOF — untouched docs never
    * join anything but the tiny drops dim. */
  private def rewriteDropping(docs: DataFrame, dropIdx: DataFrame): DataFrame = {
    val drops = dropIdx.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("idx"))).as("drops"))
    docs.select(col("doc_id"), toks(col("text")).as("toks"))
      .join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        when(col("drops").isNull, col("toks"))
          .otherwise(filter(col("toks"),
            (_, i) => !array_contains(col("drops"), i.cast("long")))).as("kept"))
      .select(col("doc_id"), col("n_toks"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  /** Incremental exact-substring SCRUB on ingest (round 9; the q91
    * rewrite against a PERSISTED history instead of the current batch):
    * every w-token span of an incoming doc whose hash exists in the
    * span store — the history corpus's distinct span set, maintained by
    * [[SpanStore.append]] — is removed, covered tokens drop, survivors
    * re-join into cleaned text. The history is never rescanned or
    * rewritten: it was deduplicated when IT was ingested, so
    * first-occurrence-wins across the whole timeline falls out of the
    * composition (q91's single-batch algebra, replayed batch by batch).
    * Scale shape: incoming occurrences (16-byte rows) semi-join the
    * h-partitioned store; the rewrite is the same in-row HOF. No
    * in-batch dedup here by contract — run [[removeDuplicateSpans]] on
    * the batch first if intra-batch duplication matters. */
  def removeStoredSpans(docs: DataFrame, w: Int,
      storeSpans: DataFrame): DataFrame = {
    val occ = docs.select(col("doc_id"), posexplode(
      graft.functions.TokenSpanHashesAll.tokenSpanHashesAll(
        toks(col("text")), w)).as(Seq("pos", "h")))
    val dropIdx = occ
      .join(storeSpans.select(col("h").as("__sh")),
        col("h") === col("__sh"), "leftsemi")
      .select(col("doc_id"),
        explode(sequence(col("pos").cast("long"),
          col("pos").cast("long") + (w - 1))).as("idx"))
      .distinct()
    rewriteDropping(docs, dropIdx)
  }

  /** Exact Jaccard (scaled 1e4) for given candidate pairs over a shingle
    * set (doc_id, h). Keep-all-pairs semantics: every candidate pair is
    * emitted, including zero-intersection pairs (jacc_1e4 = 0) — callers
    * wanting only overlapping pairs filter on `jacc_1e4 > 0`. */
  def jaccardOf(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val perDoc = sh.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("hs"), count(lit(1)).as("n"))
    jaccardOfPerDoc(pairs, perDoc)
  }

  /** Jaccard verification against a per-doc profile (doc_id, hs, n):
    * two per-doc joins (one row per doc — orders of magnitude smaller
    * than the shingle stream) and a narrow array-intersection, instead
    * of re-exploding every shingle through a candidate×shingle join. */
  private def jaccardOfPerDoc(pairs: DataFrame, perDoc: DataFrame): DataFrame =
    pairs
      .join(perDoc.select(col("doc_id").as("zd1"), col("hs").as("hs1"), col("n").as("n1")),
        col("d1") === col("zd1"))
      .join(perDoc.select(col("doc_id").as("zd2"), col("hs").as("hs2"), col("n").as("n2")),
        col("d2") === col("zd2"))
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))).cast("long"))
      .select(col("d1"), col("d2"),
        ratio1e4(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double")).as("jacc_1e4"))

  /** Band signatures from a per-doc minhash profile (doc_id, mh0..mh7). */
  private def bandSignatures(mh: DataFrame): DataFrame =
    mh.select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))

  /** LSH candidate pairs from band-signature equality. */
  private def candidatesOf(bands: DataFrame): DataFrame = {
    val ba = bands.select(col("doc_id").as("d1"), col("band"), col("sig"))
    val bb = bands.select(col("doc_id").as("d2"), col("band").as("band2"), col("sig").as("sig2"))
    ba.join(bb,
        col("band") === col("band2") && col("sig") === col("sig2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** LSH candidate pairs: all 8 permutation minima in one groupBy pass,
    * 4 band signatures, equality self-join on (band, sig). */
  def minhashCandidates(sh: DataFrame): DataFrame = {
    val mhAggs = HashParams.map { case (k, a, b) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"mh$k")
    }
    candidatesOf(bandSignatures(sh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)))
  }

  /** Streaming dedup-on-ingest: near-dup check of an INCOMING document
    * stream against a STATIC reference corpus — the incremental form of
    * [[nearDupPairs]] (e.g. "is this crawled page already in the
    * training set?"). Append-mode safe: the stream side is pure per-row
    * work (in-row shingle set + in-row minhash minima — interpreted
    * HOFs, fine at micro-batch sizes; the static side uses the codegen
    * batch profile, materialized once via eager localCheckpoint), then
    * two stream-static joins: band-signature equality for candidates,
    * profile lookup for exact-Jaccard verification. No stateful ops and
    * no stream-side aggregation. A stream doc matching a reference doc
    * in k bands emits ONE row per matching band — dedupe downstream
    * (e.g. dropDuplicatesWithinWatermark) if exactly-one is needed.
    * Output: (doc_id, ref_doc_id, jacc_1e4). */
  def nearDupAgainst(stream: DataFrame, corpus: DataFrame,
      threshold1e4: Long): DataFrame =
    ProfileStore.nearDupAgainstProfile(stream,
      ProfileStore.profileOf(corpus).localCheckpoint(eager = true),
      threshold1e4)

  /** Asymmetric CONTAINMENT near-dup: C(A→B) = |A∩B| / |A| — the
    * sub-document duplication detector (a short doc fully embedded in a
    * long one scores ~1.0 on containment while Jaccard, diluted by the
    * long doc's size, misses it). Same LSH band candidates and per-doc
    * profile as [[nearDupPairs]]; emits both directions per pair and
    * keeps pairs where either direction reaches the threshold. */
  def containmentPairs(docs: DataFrame, threshold1e4: Long): DataFrame = {
    val mhAggs = HashParams.map { case (k, a, b) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"mh$k")
    }
    val aggs = mhAggs :+ collect_list(col("h")).as("hs") :+ count(lit(1)).as("n")
    val perDoc = shingleHashes(docs).groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(eager = true)
    val cand = candidatesOf(bandSignatures(
      perDoc.select(col("doc_id") +: HashParams.map { case (k, _, _) => col(s"mh$k") }: _*)))
    cand
      .join(perDoc.select(col("doc_id").as("zd1"), col("hs").as("hs1"), col("n").as("n1")),
        col("d1") === col("zd1"))
      .join(perDoc.select(col("doc_id").as("zd2"), col("hs").as("hs2"), col("n").as("n2")),
        col("d2") === col("zd2"))
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))).cast("long"))
      .select(col("d1"), col("d2"),
        ratio1e4(col("inter").cast("double") / col("n1").cast("double")).as("cont1_1e4"),
        ratio1e4(col("inter").cast("double") / col("n2").cast("double")).as("cont2_1e4"))
      .filter(greatest(col("cont1_1e4"), col("cont2_1e4")) >= threshold1e4)
  }

  /** Full MinHash+LSH near-dup pipeline: candidate pairs with verified
    * exact Jaccard ≥ threshold (scaled 1e4).
    *
    * ONE groupBy(doc_id) pass produces the whole per-doc profile — all 8
    * permutation minima, the shingle-hash array, and the set size.
    * (Measured dead end, do not "optimize" this into in-row HOFs: an
    * array_min-over-transform formulation of the 8 minima — zero
    * shuffles — benched 30× SLOWER, because Spark evaluates HOF lambdas
    * interpreted per element while the exploded aggregation runs in
    * whole-stage codegen. The single groupBy is the right trade.)
    * The profile is
    * materialized once via eager `localCheckpoint` (MEMORY_AND_DISK
    * blocks, lineage-truncated), so the shingling subtree runs exactly
    * once and serves all three consumers (band self-join + both
    * verification sides). Unlike `persist`, checkpoint blocks are NOT
    * registered in the CacheManager: the ContextCleaner frees them as
    * soon as the returned DataFrame is unreachable, so repeated calls in
    * a long-lived session hold flat storage memory. Candidates come from
    * the band self-join; verification is two joins against the profile. */
  def nearDupPairs(docs: DataFrame, threshold1e4: Long): DataFrame = {
    val mhAggs = HashParams.map { case (k, a, b) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"mh$k")
    }
    val aggs = mhAggs :+ collect_list(col("h")).as("hs") :+ count(lit(1)).as("n")
    val perDoc = shingleHashes(docs).groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(eager = true)
    val cand = candidatesOf(bandSignatures(
      perDoc.select(col("doc_id") +: HashParams.map { case (k, _, _) => col(s"mh$k") }: _*)))
    jaccardOfPerDoc(cand, perDoc.select(col("doc_id"), col("hs"), col("n")))
      .filter(col("jacc_1e4") >= threshold1e4)
  }
}
