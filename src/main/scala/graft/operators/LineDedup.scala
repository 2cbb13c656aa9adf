package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact deduplication with document reconstruction — the
  * C4/Gopher-style preprocessing pass (Raffel et al. 2020 §2.2 keeps one
  * occurrence of every three-sentence span; the industry-standard exact
  * variant dedups verbatim LINES corpus-wide, which kills boilerplate
  * headers/footers/nav text that repeats across pages).
  *
  * Granularity note vs the existing family: q31 dedups whole documents,
  * q68/q91/q110 dedup rolling TOKEN SPANS (substring granularity,
  * position-hashed); this operator dedups verbatim text LINES and then
  * REBUILDS each document from its surviving lines in order — the form
  * whose output is directly a cleaned training corpus.
  *
  * 100 TB design:
  *  - The keep-rule ("a line survives only at its globally first
  *    occurrence, ordered by (doc_id, line_idx)") is computed as
  *    `min(struct(doc_id, idx))` per line key — a PARTIAL-AGGREGABLE
  *    min, so a boilerplate line occurring 100M times costs map-side
  *    combine + one tiny reduce row, never a 100M-row window partition.
  *    A `row_number() over (partition by line)` formulation would put
  *    the hottest line's every occurrence in one task; the min-struct
  *    form is skew-immune by construction.
  *  - Lines shuffle as (hash, doc_id, idx) triples (64-bit FNV of the
  *    line), never as line text — and the winner aggregation's output
  *    IS the survivor set (no join-back pass at all, r11): surviving
  *    positions group per doc_id and join the original rows once,
  *    where the kept lines re-extract IN-ROW from the doc's own split.
  *  - Reconstruction sorts only WITHIN a document's kept-index list
  *    (lines-per-doc sized, never global).
  */
object LineDedup {

  /** Deterministic w-token "lines" for corpora without newlines (the
    * fixture corpus): chunk the space-separated token stream and join
    * with \n — a pure function of the text, identically expressible in
    * SQL, so oracles and probes share the exact lining rule.
    *
    * Column-expression form: the `split` inside the transform lambda
    * re-evaluates PER CHUNK (lambda bodies are outside subexpression
    * elimination), making this O(tokens²/w) per document — fine for
    * short rows, wrong for long ones. [[withChunkedLines]] is the
    * linear form: it materializes the token array as a real column
    * first, which CollapseProject will not inline back into the lambda
    * (multi-use non-cheap alias), so each document splits exactly once. */
  def chunkLines(textCol: org.apache.spark.sql.Column,
      tokensPerLine: Int): org.apache.spark.sql.Column =
    chunkOf(split(textCol, " "), tokensPerLine)

  /** The w-token lines as an ARRAY column (no "\n" string round-trip):
    * the shared kernel of [[chunkOf]] (which joins it with \n) and
    * [[rebuildChunked]] (which consumes the array directly). */
  private def linesOf(toks: org.apache.spark.sql.Column,
      tokensPerLine: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0),
        ((size(toks) - 1) / tokensPerLine).cast("int")),
      i => array_join(
        slice(toks, i * tokensPerLine + 1, lit(tokensPerLine)), " "))

  private def chunkOf(toks: org.apache.spark.sql.Column,
      tokensPerLine: Int): org.apache.spark.sql.Column =
    array_join(linesOf(toks, tokensPerLine), "\n")

  /** Linear-cost chunking: rewrites `textCol` in place to its w-token
    * lined form, splitting each document exactly once (see
    * [[chunkLines]]). */
  def withChunkedLines(df: DataFrame, textCol: String,
      tokensPerLine: Int): DataFrame =
    df.withColumn("__ld_toks", split(col(textCol), " "))
      .withColumn(textCol, chunkOf(col("__ld_toks"), tokensPerLine))
      .drop("__ld_toks")

  /** Per-document occurrence stream: (doc_id, idx, line, h). Empty
    * documents produce one empty line (split semantics), which then
    * dedups like any other line. */
  def lineOccurrences(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .withColumn("h", graft.functions.Fnv1aHash.fnv1a64(col("line")))

  /** Surviving (doc_id, idx) positions only: each distinct line kept
    * solely at its first (doc_id, idx) position corpus-wide, computed
    * directly from the min(struct) winner aggregation — the winner row
    * IS the surviving occurrence, so no join-back to the occurrence
    * stream exists (r11 rewrite: the old form joined winners back to a
    * LINE-TEXT-carrying occurrence stream on the hash, shuffling the
    * corpus text the scaladoc promised never shuffles; the narrow form
    * moves only (h, doc_id, idx) triples end to end and drops a whole
    * join+filter pass — measured 3.54 s → see BASELINE r11 at the 10×
    * corpus). Text re-attaches per document in [[rebuild]]. */
  def survivorIdx(docs: DataFrame, textCol: String = "text"): DataFrame =
    lineOccurrences(docs, textCol)
      .select(col("doc_id"), col("idx"), col("h"))
      // min(struct) — lexicographic on (doc_id, idx): the global
      // first-occurrence winner per line hash, skew-safe (see scaladoc)
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.idx").as("idx"))

  /** Surviving occurrences WITH their line text — the narrow winner set
    * joined to the documents on doc_id (text never shuffles on the
    * line hash; the line re-extracts in-row from the doc's own split). */
  def survivors(docs: DataFrame, textCol: String = "text"): DataFrame =
    survivorIdx(docs, textCol)
      .join(docs.select(col("doc_id"), col(textCol).as("__t")), Seq("doc_id"))
      .select(col("doc_id"), col("idx"),
        element_at(split(col("__t"), "\n"), col("idx") + 1).as("line"))

  /** Rebuild each document from its surviving lines (in original order),
    * with kept/dropped accounting. Documents whose every line was
    * deduped away remain present with an empty `cleaned`. Totals come
    * in-row from the split width — no second pass over the corpus. */
  def rebuild(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // winner idx lists per doc (ints only through both shuffles), then
    // ONE doc-keyed join against the original rows: cleaned re-extracts
    // the kept lines in-row from the doc's own split, and totals ride
    // the same row — no corpus text ever crosses an exchange
    val kept = survivorIdx(docs, textCol)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("__ki"))
    docs.select(col("doc_id"),
        split(col(textCol), "\n").as("__ls"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("__ls")).cast("long").as("n_lines"),
        coalesce(size(col("__ki")), lit(0)).cast("long").as("n_kept"),
        (size(col("__ls")) - coalesce(size(col("__ki")), lit(0)))
          .cast("long").as("n_dropped"),
        when(col("__ki").isNull, lit(""))
          .otherwise(array_join(
            transform(col("__ki"), i => element_at(col("__ls"), i + 1)),
            "\n")).as("cleaned"))
  }

  /** Chunked rebuild with a BROADCAST kept-index join (r12, verdict
    * item 3): answer-equal to `rebuild(withChunkedLines(docs, textCol,
    * w), textCol)` — LineDedupSpec pins it. The one plan change that
    * measured as a win: the kept-index lists (ints per doc — thousands
    * of times smaller than the text) BROADCAST into the rebuild join
    * when the corpus is under `spark.graft.linededup.broadcastMaxDocs`
    * (default 1M docs), so the document text NEVER crosses an exchange
    * (the un-fused rebuild sort-merge-joins, shuffling the split
    * arrays); above the gate it falls back to the shuffled join — the
    * 100 TB shape, where kept is itself corpus-sized.
    *
    * Measured dead ends at the 10× corpus (CurationProbe r12), kept
    * out deliberately:
    *  - eager doc_id-partitioned localCheckpoint of the line arrays
    *    (read once, share blocks): materializing fat string arrays
    *    cost MORE than the second parquet scan it saves (2.4 → 2.7 s);
    *  - exploding a line ARRAY (`transform(sequence, slice…)`) instead
    *    of the "\n" chunk-string round-trip: the interpreted HOF
    *    inside Generate ran the occurrence pass 0.9 → 2.4 s — the
    *    string split is the fast form, counter-intuitively. */
  def rebuildChunked(docs: DataFrame, textCol: String,
      tokensPerLine: Int): DataFrame = {
    val s = docs.sparkSession
    val chunked = withChunkedLines(
      docs.select(col("doc_id"), col(textCol)), textCol, tokensPerLine)
    val kept = survivorIdx(chunked, textCol)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("__ki"))
    val maxDocs = s.conf.getOption("spark.graft.linededup.broadcastMaxDocs")
      .map(_.toLong).getOrElse(1000000L)
    val lined = chunked.select(col("doc_id"), split(col(textCol), "\n").as("__ls"))
    val joined =
      if (docs.count() <= maxDocs) lined.join(broadcast(kept), Seq("doc_id"), "left")
      else lined.join(kept, Seq("doc_id"), "left")
    joined.select(col("doc_id"),
      size(col("__ls")).cast("long").as("n_lines"),
      coalesce(size(col("__ki")), lit(0)).cast("long").as("n_kept"),
      (size(col("__ls")) - coalesce(size(col("__ki")), lit(0)))
        .cast("long").as("n_dropped"),
      when(col("__ki").isNull, lit(""))
        .otherwise(array_join(
          transform(col("__ki"), i => element_at(col("__ls"), i + 1)),
          "\n")).as("cleaned"))
  }
}
