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
  *  - Lines shuffle as 16-byte (hash, doc_id, idx) triples (64-bit FNV
  *    of the line), never as line text; the winner set joins back to
  *    the narrow occurrence stream on the hash — an equality join both
  *    sides partition on.
  *  - Reconstruction groups by doc_id (the natural partitioning of the
  *    input) and sorts only WITHIN a document (lines-per-doc sized,
  *    never global).
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

  private def chunkOf(toks: org.apache.spark.sql.Column,
      tokensPerLine: Int): org.apache.spark.sql.Column =
    array_join(
      transform(
        sequence(lit(0),
          ((size(toks) - 1) / tokensPerLine).cast("int")),
        i => array_join(
          slice(toks, i * tokensPerLine + 1, lit(tokensPerLine)), " ")),
      "\n")

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

  /** Surviving occurrences only: each distinct line kept solely at its
    * first (doc_id, idx) position corpus-wide. The occurrence stream is
    * eagerly localCheckpointed: it feeds both the winner aggregation
    * and the probe side of the join-back, and re-running the
    * split+hash subtree per consumer would double the corpus scan (the
    * q32 shared-subtree discipline). */
  def survivors(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val occ = lineOccurrences(docs, textCol).localCheckpoint(true)
    // min(struct) — lexicographic on (doc_id, idx): the global
    // first-occurrence winner per line hash, skew-safe (see scaladoc).
    val winners = occ.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
      .select(col("h"), col("w.doc_id").as("w_doc"), col("w.idx").as("w_idx"))
    occ.join(winners, "h")
      .filter(col("doc_id") === col("w_doc") && col("idx") === col("w_idx"))
      .select(col("doc_id"), col("idx"), col("line"))
  }

  /** Rebuild each document from its surviving lines (in original order),
    * with kept/dropped accounting. Documents whose every line was
    * deduped away remain present with an empty `cleaned`. Totals come
    * in-row from the split width — no second pass over the corpus. */
  def rebuild(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val surv = survivors(docs, textCol)
    val kept = surv.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          x => x.getField("line")),
        "\n").as("cleaned"))
    val totals = docs.select(col("doc_id"),
      size(split(col(textCol), "\n")).cast("long").as("n_lines"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
