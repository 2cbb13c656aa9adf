package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Canon.ratio1e4

/** Persistent, incrementally-maintained near-dup corpus profile — the
  * operational 100 TB form of dedup-on-ingest (r8 verdict item 5).
  *
  * [[TextDedup.nearDupAgainst]] recomputes the reference corpus's
  * band/minhash profile per session; at scale the reference side is the
  * whole training set and must never be recomputed. This store
  * materializes the per-doc profile ONCE as parquet and then MERGEs
  * each ingested batch's signatures into it (an append of
  * delta-profile rows — the profile is keyed by doc_id, and a doc's
  * profile row is immutable, so the merge is a pure blind append with
  * no read-modify-write of existing rows). The reference anchor is the
  * checkpoint-resume generalization of the reference's sender loop
  * (reference/internal/binwatch/blsenderwork/blsenderwork.go:204-213 —
  * resume from persisted state instead of replaying history).
  *
  * Cost shape: [[append]] runs the narrow shingle/minhash pass over the
  * NEW docs only and writes one file set — cost tracks the delta, never
  * the accumulated corpus (ScaleProbe's q101 row measures exactly
  * this). [[read]] is a plain parquet scan of profile rows (doc_id,
  * mh0..mh7, hs, n); the band rows the candidate join needs are derived
  * narrowly at read time (4 tiny rows per doc) rather than stored 4×.
  * Writes go through a doc_id repartition so every append lands with
  * the same uniform layout the verify join shuffles on — the q91
  * occurrence-stream convention applied to the profile's own join key.
  *
  * Answer contract: reading profile+deltas and probing with
  * [[nearDupAgainstProfile]] is hash-identical to the from-scratch
  * [[TextDedup.nearDupAgainst]] algebra (q101 oracles this against
  * q90's own DuckDB twin; the parquet round-trip preserves the profile
  * exactly — hs order is immaterial to array_intersect).
  */
object ProfileStore {

  import TextDedup.{HashParams, P, toks}

  private def mhAggs = HashParams.map { case (k, a, b) =>
    min((lit(a) * col("h") + lit(b)) % P).as(s"mh$k")
  }

  /** One-pass per-doc profile of a corpus: (doc_id, mh0..mh7, hs, n) —
    * all 8 permutation minima, the distinct shingle-hash array, and the
    * set size, from a single groupBy(doc_id) over the codegen shingle
    * kernel (the [[TextDedup.nearDupPairs]] profile pass, shared). */
  def profileOf(docs: DataFrame): DataFrame = {
    val aggs = mhAggs :+ collect_list(col("h")).as("hs") :+ count(lit(1)).as("n")
    TextDedup.shingleHashes(docs).groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MERGE a batch of newly ingested docs into the store at `path`:
    * profile the batch (narrow, delta-sized) and append. Callers own
    * doc_id uniqueness across appends (re-appending a doc_id would
    * duplicate its candidates — same contract as any log-structured
    * store). */
  def append(docs: DataFrame, path: String): Unit =
    profileOf(docs)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .write.mode("append").parquet(path)

  /** The accumulated profile — base plus every merged delta. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Near-dup check of an incoming document stream against a PREBUILT
    * reference profile (from [[profileOf]] or [[read]]): in-row
    * shingles + minhash minima on the stream side (no stream-side
    * aggregation — append-mode safe), band-signature equality for
    * candidates, profile lookup for exact-Jaccard verification. A
    * stream doc matching a reference doc in k bands emits one row per
    * matching band — dedupe downstream if exactly-once is needed.
    * Output: (doc_id, ref_doc_id, jacc_1e4). */
  def nearDupAgainstProfile(stream: DataFrame, refProf: DataFrame,
      threshold1e4: Long): DataFrame = {
    val refBands = refProf
      .select(col("doc_id") +: HashParams.map { case (k, _, _) => col(s"mh$k") }: _*)
      .select(col("doc_id"), explode(TextDedup.bandStructs).as("bs"))
      .select(col("doc_id").as("ref_doc_id"),
        col("bs.band").as("rband"), col("bs.sig").as("rsig"))
    val refVerify = refProf.select(col("doc_id").as("rv_doc"),
      col("hs").as("rhs"), col("n").as("rn"))

    val prof = stream
      .withColumn("hs", graft.functions.TokenSpanHashes.tokenSpanHashes(
        toks(col("text")), 2))
      .filter(size(col("hs")) > 0)
      .select(Seq(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("n")) ++
        HashParams.map { case (k, a, b) =>
          array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % P)).as(s"mh$k")
        }: _*)
    // band explode carries the profile along (joining the stream back to
    // itself would be a stream-stream join needing watermarks)
    prof.select(col("doc_id"), col("hs"), col("n"),
        explode(TextDedup.bandStructs).as("bs"))
      .select(col("doc_id"), col("hs"), col("n"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
      .join(refBands, col("band") === col("rband") && col("sig") === col("rsig"))
      .join(refVerify, col("ref_doc_id") === col("rv_doc"))
      .withColumn("inter", size(array_intersect(col("hs"), col("rhs"))).cast("long"))
      .select(col("doc_id"), col("ref_doc_id"),
        ratio1e4(col("inter").cast("double") /
          (col("n") + col("rn") - col("inter")).cast("double")).as("jacc_1e4"))
      .filter(col("jacc_1e4") >= threshold1e4)
  }
}
