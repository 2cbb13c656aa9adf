package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text embeddings by hashed random projection — the
  * text→vector BRIDGE of the pipeline (feature extraction without an
  * external model): embed(doc)[d] = Σ_tokens tf(t) · c_d(h(t)) / 1000,
  * where h is the portable polynomial token hash (TextDedup.strHash)
  * and c_d(h) = ((h·A_d + B_d) mod P) mod 2001 − 1000 is a pseudo-
  * random integer coefficient in [−1000, 1000] derived per dimension —
  * the hashing-trick / random-projection construction (feature
  * hashing, Weinberger et al. 2009), with the projection matrix
  * GENERATED from the hash instead of stored.
  *
  * Scale shape: NO vocabulary, NO stored matrix, NO join — one narrow
  * token explode and ONE groupBy(doc_id) carrying all `dims` sums as
  * aggregate columns (the q34 SimHash pattern). The fixed-point sums
  * are exact integers, so the embedding is bit-identical across
  * engines, runs, and cluster sizes; the double form divides those
  * integers by 1000.0 once (one IEEE op, identical everywhere).
  */
object TextEmbed {

  val P = 1000000007L

  private[graft] def coefA(d: Int): Long = 48271L + 104729L * d
  private[graft] def coefB(d: Int): Long = 12345L + 31L * d

  private def coef(th: Column, d: Int): Column =
    ((th * coefA(d) + coefB(d)) % P) % 2001L - 1000L

  /** Fixed-point form: (doc_id, e0..e{dims-1}) — per-dimension integer
    * sums Σ tf·c_d, scaled ×1000 (the oracle-exact form; q107 hashes
    * this). Docs with no tokens drop (no embedding exists for them —
    * callers union a zero row if they need total coverage). */
  def embedFixedPoint(docs: DataFrame, textCol: String, dims: Int): DataFrame = {
    val th = docs.select(col("doc_id"),
      explode(TextDedup.tokenHashes(col(textCol))).as("th"))
    val sums = (0 until dims).map(d =>
      sum(coef(col("th"), d)).cast("long").as(s"e$d"))
    th.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
  }

  /** Double form for downstream vector ops (Similarity.*): the same
    * integer sums divided by 1000.0 into an array column `emb`. */
  def embed(docs: DataFrame, textCol: String, dims: Int): DataFrame =
    embedFixedPoint(docs, textCol, dims)
      .select(col("doc_id"),
        array((0 until dims).map(d => col(s"e$d").cast("double") / 1000.0): _*)
          .as("emb"))
}
