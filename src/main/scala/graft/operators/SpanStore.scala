package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Persistent span-hash store — the history side of incremental
  * exact-substring scrubbing ([[TextDedup.removeStoredSpans]]); the
  * [[ProfileStore]] pattern applied to the q91 occurrence family.
  *
  * Each ingested batch appends its DISTINCT w-token span hashes (8-byte
  * rows, h-repartitioned so every append lands with the layout the
  * membership semi-join shuffles on). Membership tolerates cross-batch
  * duplicates — a hash present twice is still just "present" — so the
  * merge stays a blind append with no read-modify-write; cost tracks
  * the batch, never the accumulated history.
  *
  * Layout (the [[graft.cdc.CdcPipeline.compact]] snapshot pattern
  * applied to the store):
  *  - `path/delta/` — blind per-batch appends since the last compaction
  *  - `path/base-NNN/` — the compacted distinct span set (absent until
  *    the first [[compact]])
  *  - `path/_store_meta.json` — the pointer: which base is active and
  *    how many rows it holds. Readers resolve the view through the
  *    pointer, so a compaction becomes visible atomically with the
  *    meta replace; stale base dirs are garbage, never wrong answers.
  *
  * Why compaction exists: appends keep per-batch distincts only, so the
  * store grows with INGEST (duplicate hashes across batches accumulate)
  * while the membership the probe needs is only the DISTINCT set —
  * at 100 TB the semi-join's build side scales with store rows, so the
  * distinct-rewrite is the operational cadence exactly like the CDC
  * lake's snapshot (r8): read base∪delta, distinct, h-repartition,
  * write the next base, swing the pointer, drop the delta. Compaction
  * cost tracks base+delta once — and every probe after it pays only
  * distinct rows. Answer contract: the scrub over a compacted store is
  * hash-identical to the raw base∪delta store (q111 oracles this with
  * q110's twin verbatim; membership is duplicate-insensitive by
  * construction).
  *
  * Single-maintainer contract (same as every log-structured piece
  * here): one process owns append/compact for a given `path`;
  * concurrent appends during a compaction could land in the delta dir
  * the compaction is about to drop. */
object SpanStore {

  /** MERGE a batch's distinct span hashes into the store at `path`. */
  def append(docs: DataFrame, w: Int, path: String): Unit =
    TextDedup.spanHashes(docs, w)
      .select(col("h")).distinct()
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("h"))
      .write.mode("append").parquet(s"$path/delta")

  /** The accumulated span set: active base (if compacted) plus every
    * delta appended since (may carry cross-batch duplicates — harmless
    * for the semi-join membership it exists to serve). */
  def read(spark: SparkSession, path: String): DataFrame = {
    // Defense in depth on top of the atomic pointer swing: if the meta
    // file is momentarily absent (a crashed half-finished writeMeta on a
    // non-atomic FS), fall back to the newest base-NNN generation rather
    // than silently serving a delta-only (under-scrubbing) view.
    val base = readMeta(spark, path).map(m => s"$path/${m.base}")
      .orElse(newestBase(spark, path))
    val dirs = base.toSeq ++
      (if (exists(spark, s"$path/delta")) Seq(s"$path/delta") else Nil)
    require(dirs.nonEmpty, s"SpanStore.read: nothing stored at $path")
    spark.read.parquet(dirs: _*)
  }

  private def newestBase(spark: SparkSession, path: String): Option[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("base-"))
      .map(_.getPath.getName).toSeq.sorted.lastOption
      .map(name => s"$path/$name")
  }

  /** Distinct-rewrite the store: base∪delta → distinct → the next base
    * generation, pointer swing, delta drop. Returns (rowsBefore,
    * rowsAfter) so callers can record the shrink. Idempotent: a rerun
    * on a just-compacted store rewrites the same distinct set. */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    val prior = readMeta(spark, path)
    val before = read(spark, path)
    val rowsBefore = before.count()
    // Generation = 1 + max(meta gen, newest base ON DISK) — not meta
    // alone (r10 review fix): a compact that crashed between the base
    // write and the meta rename leaves an orphan base-N with no meta;
    // deriving gen from meta alone would (a) rewrite INTO the
    // directory the read() fallback is concurrently scanning
    // (mode=overwrite deletes it mid-job) and (b) after later meta
    // loss, regress below surviving higher-numbered bases, serving a
    // stale view. Writing strictly above everything on disk keeps
    // reruns convergent and the newest-base fallback monotone.
    val onDisk = newestBase(spark, path)
      .map(_.split("base-").last.toLong)
    val gen = ((prior.map(_.gen) ++ onDisk).foldLeft(-1L)(math.max)) + 1L
    val nextBase = f"base-$gen%06d"
    before.distinct()
      .repartition(spark.sparkContext.defaultParallelism, col("h"))
      .write.mode("overwrite").parquet(s"$path/$nextBase")
    val rowsAfter = spark.read.parquet(s"$path/$nextBase").count()
    writeMeta(spark, path, Meta(nextBase, gen, rowsAfter))
    // pointer is live — old generations and the covered delta are now
    // unreachable garbage; drop them (best-effort: a failure here
    // leaves stale files, never a wrong view)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$path/delta"), true)
    prior.foreach(m => fs.delete(new Path(s"$path/${m.base}"), true))
    (rowsBefore, rowsAfter)
  }

  /** The production cadence rule (the [[graft.cdc.CdcPipeline
    * .compactIfNeeded]] shape): compact when the accumulated delta
    * outgrows `maxDeltaRatio` × the compacted base (always, for a
    * never-compacted store with any delta). Both counts are parquet
    * metadata-cheap scans of 8-byte-row files. */
  def compactIfNeeded(spark: SparkSession, path: String,
      maxDeltaRatio: Double = 0.2, minDeltaRows: Long = 0L): Option[(Long, Long)] =
    readMeta(spark, path) match {
      // Never-compacted store: compact only if something was appended —
      // on a virgin path there is nothing to do (and read() would throw).
      case None =>
        if (exists(spark, s"$path/delta")) Some(compact(spark, path)) else None
      case Some(m) =>
        val deltaRows = if (exists(spark, s"$path/delta"))
          spark.read.parquet(s"$path/delta").count() else 0L
        if (deltaRows > 0 &&
            deltaRows >= math.max(minDeltaRows.toDouble, maxDeltaRatio * m.rows))
          Some(compact(spark, path))
        else None
    }

  private final case class Meta(base: String, gen: Long, rows: Long)

  private def metaPath(path: String) = new Path(s"$path/_store_meta.json")

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readMeta(spark: SparkSession, path: String): Option[Meta] = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        Some(Meta(n.get("base").asText(), n.get("gen").asLong(),
          n.get("rows").asLong()))
      } finally in.close()
    }
  }

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path/._store_meta.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"base":"${m.base}","gen":${m.gen},"rows":${m.rows}}"""
        .getBytes("UTF-8"))
    finally out.close()
    // rename-with-overwrite is the atomic primitive (HDFS supports it
    // through FileContext; local FS maps it to an atomic move). A plain
    // delete-then-rename would open a window where no meta exists and a
    // reader would silently see a delta-only view — the pointer file is
    // the single thing that must move atomically.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
