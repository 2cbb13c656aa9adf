package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent span-hash store — the history side of incremental
  * exact-substring scrubbing ([[TextDedup.removeStoredSpans]]); the
  * [[ProfileStore]] pattern applied to the q91 occurrence family.
  *
  * Each ingested batch appends its DISTINCT w-token span hashes (8-byte
  * rows, h-repartitioned so every append lands with the layout the
  * membership semi-join shuffles on). Membership tolerates cross-batch
  * duplicates — a hash present twice is still just "present" — so the
  * merge stays a blind append with no read-modify-write; cost tracks
  * the batch, never the accumulated history. */
object SpanStore {

  /** MERGE a batch's distinct span hashes into the store at `path`. */
  def append(docs: DataFrame, w: Int, path: String): Unit =
    TextDedup.spanHashes(docs, w)
      .select(col("h")).distinct()
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("h"))
      .write.mode("append").parquet(path)

  /** The accumulated span set (may carry cross-batch duplicates —
    * harmless for the semi-join membership it exists to serve). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
