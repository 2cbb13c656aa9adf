package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuously-maintained duplicate clustering — the streaming face of
  * the q151 ClusterStore: a stream of VERIFIED near-dup pairs (e.g.
  * `ProfileStore.nearDupAgainstProfile` over the ingest stream, q90's
  * operator) lands into a persisted label store micro-batch by
  * micro-batch, so "which cluster is this document in?" is answerable
  * at any moment without ever re-running connected components over
  * history — the operational loop a dedup-on-ingest deployment runs
  * (reference anchor: the resume-from-checkpoint sender loop,
  * reference/internal/binwatch/blsenderwork/blsenderwork.go:204-213).
  *
  * Exactly-once EFFECT from at-least-once foreachBatch: applyDelta is
  * IDEMPOTENT under batch replay — a replayed pair's endpoints are
  * already in the base (not re-appended), and its contracted label
  * edge is a self-loop (already merged ⇒ empty remap), so re-applying
  * a delivered batch changes nothing. StreamingClustersSpec pins
  * replay idempotence, restart continuation, and final-state equality
  * with from-scratch CC over the union of all batches.
  *
  * State/scale shape is the store's (ClusterStore scaladoc): per batch
  * one broadcast-semi label probe against the base scan, CC over the
  * label-contracted delta graph, label-level remap rows, delta-sized
  * appends. `maxRemap` compaction runs opportunistically between
  * batches.
  */
object StreamingClusters {

  /** Start maintaining the store at `path` from a STREAMING frame of
    * verified pairs (columns `d1`, `d2`). The checkpointLocation
    * governs the stream's own exactly-once offsets; the store tolerates
    * replays regardless (idempotence above). */
  def maintain(pairs: DataFrame, d1: String, d2: String, path: String,
      checkpointDir: String, maxRemap: Int = 100000): StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          graft.operators.ClusterStore.applyDelta(spark, path, batch, d1, d2)
          graft.operators.ClusterStore.compactIfNeeded(spark, path, maxRemap)
          ()
        }
      }
      .start()
}
