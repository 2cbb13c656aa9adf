package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained near-dup CLUSTER LABELS — the
  * operational gap between the per-doc profile store (q101: "is this
  * new doc a near-dup of anything?") and the batch-recomputed
  * components (q56/q69: "which docs form one duplicate cluster?"):
  * when a delta batch lands, its verified near-dup pairs touch only
  * the clusters containing a band-match, so the clustering should
  * update by merging THOSE labels against a persisted store instead of
  * re-running connected components over all history (r11 verdict item;
  * the q88/q127/q110 store+delta ≡ from-scratch discipline, anchored
  * on the reference's resume-from-checkpoint loop,
  * reference/internal/binwatch/blsenderwork/blsenderwork.go:204-213).
  *
  * Layout at `path` (log-structured, single-maintainer like SpanStore):
  *   base-NNN/  — blind-appended (id, component) rows, one row per id:
  *                each batch's NEW vertices labeled as of their append
  *                time. Rows are immutable; later merges never rewrite
  *                them. NNN is the compaction generation, selected by
  *                the `_basegen` pointer file (atomic rename swing).
  *   _remap.tsv — the TINY label-forwarding table (old → new): every
  *                cluster merge adds one entry; reads resolve
  *                component' = coalesce(remap[component], component).
  *                Kept TRANSITIVELY CLOSED at every applyDelta (new
  *                entries compose into the old ones before the atomic
  *                single-file overwrite-rename), so a read needs
  *                exactly one broadcast hash lookup — never a chase.
  *
  * Incremental algebra (the union-of-quotients law ClusterStoreSpec
  * pins): labels are min-reachable-vertex-ids, so merging components
  * A, B, ... reachable through a new pair set is CC over the
  * CONTRACTED graph whose vertices are current labels — and because
  * every label is the min id of its members, the contracted CC's
  * min-label IS the global min id of the merged cluster. Hence
  * build(histPairs) then applyDelta(deltaPairs) is bit-equal to
  * connectedComponents(histPairs ∪ deltaPairs) for any batch split.
  *
  * Cost shape at 100 TB: applyDelta shuffles only delta-pair-derived
  * rows. The two history-touching steps are (a) labeling the delta
  * pairs' endpoints — a broadcast-probe of the endpoint set against
  * the base scan (no history shuffle; at real scale the id-keyed
  * layout row-group-prunes the scan), and (b) nothing else: relabels
  * are LABEL-level remap rows, never per-member rewrites, so a merge
  * of two million-doc clusters writes ONE row. The remap table grows
  * with merges, not corpus: [[compactIfNeeded]] folds it into a fresh
  * base generation (distinct ids, resolved labels) when it exceeds the
  * threshold — same pointer-swing atomicity as SpanStore.
  */
object ClusterStore {

  /** Initialize the store: connected components over the base corpus's
    * verified pair list (vertices = pair endpoints, label =
    * min-reachable id — the GraphDedup contract). */
  def build(pairs: DataFrame, d1: String, d2: String, path: String): Unit = {
    val spark = pairs.sparkSession
    // r12 ADVICE: build is INIT-ONLY — a second build on the same path
    // (or a build after a bootstrap applyDelta) would append duplicate
    // base rows, breaking the one-row-per-id invariant read()/applyDelta
    // rely on. Fail loudly instead of corrupting labels.
    require(!exists(spark, activeBase(spark, path)),
      s"ClusterStore.build: store already initialized at $path — " +
        "use applyDelta to merge new pairs, or point build at a fresh path")
    val labels = GraphDedup.connectedComponents(pairs, d1, d2)
    labels.select(col("id"), col("component"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .write.mode("append").parquet(activeBase(spark, path))
  }

  /** Current labels: base rows with the (transitively closed) remap
    * applied — one broadcast lookup over the base scan. Base holds
    * each id exactly once (build writes CC output; applyDelta appends
    * only ids history has never seen), so no dedup pass is needed. */
  def read(spark: SparkSession, path: String): DataFrame =
    readWithRemap(spark, path, readRemap(spark, path))

  private def readWithRemap(spark: SparkSession, path: String,
      remap: Map[Long, Long]): DataFrame = {
    val dir = activeBase(spark, path)
    require(exists(spark, dir),
      s"ClusterStore.read: nothing stored at $path")
    val base = spark.read.parquet(dir)
    if (remap.isEmpty) base.select(col("id"), col("component"))
    else {
      import spark.implicits._
      val rm = remap.toSeq.toDF("old", "new")
      base.join(broadcast(rm), base("component") === rm("old"), "left")
        .select(base("id"),
          coalesce(rm("new"), base("component")).as("component"))
    }
  }

  /** MERGE a delta batch's verified near-dup pairs (delta×delta plus
    * delta×history, e.g. from [[TextDedup.nearDupPairs]] on the delta
    * and [[ProfileStore.nearDupAgainstProfile]] against the profile
    * store) into the clustering. Blind-appends the delta endpoints'
    * rows and atomically replaces the remap — history rows are never
    * rewritten. */
  def applyDelta(spark: SparkSession, path: String, newPairs: DataFrame,
      d1: String, d2: String): Unit = {
    val pairs = newPairs
      .select(col(d1).cast("long").as("pa"), col(d2).cast("long").as("pb"))
      // NULL endpoints drop (review fix): a pair with an unknown member
      // is meaningless, and a NULL id would otherwise append a
      // (NULL, NULL) base row on EVERY batch carrying one (NULL keys
      // never match the semi-probe, so it looks "new" forever)
      .filter(col("pa").isNotNull && col("pb").isNotNull)
      .localCheckpoint(true) // consumed 3x below
    // bootstrap-safe: a delta against a store with no base yet treats
    // history as empty (every endpoint is new) — so a stream can
    // maintain a store from nothing ([[build]] stays the batch-init
    // fast path; StreamingClusters relies on this). The remap is read
    // ONCE here and shared with the composition below (review fix:
    // read() re-parsed it a second time on the maintenance hot path).
    val oldRemap: Map[Long, Long] = readRemap(spark, path)
    val current =
      if (exists(spark, activeBase(spark, path)))
        readWithRemap(spark, path, oldRemap)
      else {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("id", "component")
      }
    val endpoints = pairs.select(col("pa").as("id"))
      .union(pairs.select(col("pb").as("id"))).distinct()
      .localCheckpoint(true)
    // current label of every endpoint, keeping whether history has the
    // id (an unseen id labels itself — exactly a fresh CC vertex; only
    // those rows append, so base stays one-row-per-id and reads need
    // no distinct). Two-step join so HISTORY NEVER SHUFFLES: a plain
    // left-outer of endpoints against the base could only broadcast
    // its right (history) side, so Spark would shuffle both; instead
    // the base scan is broadcast-SEMI-filtered down to the endpoint
    // ids (endpoint-sized output, no exchange on the scan), and the
    // outer join runs endpoints-vs-that — both sides tiny.
    // broadcast only under a size gate (default 4M endpoints ≈ 32 MB):
    // a monster delta falls back to shuffle joins — correct at any
    // cardinality, just not scan-cheap (and at that point the delta is
    // history-sized anyway, so a shuffle is the honest cost)
    val bcastMax = spark.conf.getOption("spark.graft.clusterstore.bcastMax")
      .map(_.toLong).getOrElse(4000000L)
    val small = endpoints.count() <= bcastMax
    def maybeBcast(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    val known = current
      .join(maybeBcast(endpoints), Seq("id"), "left_semi")
      .localCheckpoint(true)
    val lbl = endpoints.join(maybeBcast(known), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("lbl"),
        col("component").isNull.as("is_new"))
      .localCheckpoint(true)
    // the contracted graph over labels: |edges| <= |delta pairs|
    val contracted = pairs
      .join(lbl.select(col("id").as("pa"), col("lbl").as("la")), Seq("pa"))
      .join(lbl.select(col("id").as("pb"), col("lbl").as("lb")), Seq("pb"))
      .select(col("la"), col("lb"))
      .filter(col("la") =!= col("lb"))
    // CC over the contracted graph (GraphDedup gates driver-local vs
    // distributed itself); entries where the label moves become remap
    // rows. min over labels == min over member ids because every label
    // IS its cluster's min id. The collect is merge-count-sized — the
    // same boundedness that lets the remap live driver-side at all.
    val moved = GraphDedup
      .connectedComponents(contracted, "la", "lb")
      .filter(col("id") =!= col("component"))
      .select(col("id").as("old"), col("component").as("new"))
      .localCheckpoint(true)
    val newRemap: Map[Long, Long] = moved
      .collect().iterator.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // PERSIST only entries whose old label actually exists in the base
    // (review fix: a brand-new vertex's self-label can "move" — e.g. a
    // fresh pair (7,8) contracts 8→7 — but no base row ever carries
    // component 8, because new vertices append at their FINAL labels;
    // keeping such entries would grow the remap with INGEST rather than
    // with merges and trigger needless full-base compactions). The full
    // newRemap still labels this batch's appends below. A live old
    // label is by definition the current label of some existing
    // (non-new) endpoint — labels of pure-new contracted components
    // never appear in base.
    val liveOld = lbl.filter(!col("is_new"))
      .select(col("lbl").as("old")).distinct()
    val persistedNew: Map[Long, Long] = moved
      .join(maybeBcast(liveOld), Seq("old"), "left_semi")
      .collect().iterator.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // compose into the existing (already-closed) remap: forward any
    // entry whose target just moved, then add the new moves. Old values
    // can never be NEW vertices' self-labels (those ids did not exist
    // before this batch), so composing with the persisted subset loses
    // nothing.
    val composed = oldRemap.map { case (o, c) =>
      o -> persistedNew.getOrElse(c, c)
    } ++ persistedNew
    // append the NEW vertices at their FINAL labels (a later merge
    // forwards them through the remap like any other base row).
    // Review fixes: (a) a batch with NO new vertices (pure replay /
    // merge-only) writes nothing — previously it appended
    // defaultParallelism EMPTY part files per micro-batch; (b) the
    // file-count per append is delta-proportional, not a fixed
    // parallelism fan-out (a 10-row delta lands as one file).
    import spark.implicits._
    val fwd = newRemap.toSeq.toDF("old", "new")
    val finalLbl = lbl.filter(col("is_new"))
      .join(broadcast(fwd), col("lbl") === col("old"), "left")
      .select(col("id"), coalesce(col("new"), col("lbl")).as("component"))
      .localCheckpoint(true)
    val nNew = finalLbl.count()
    if (nNew > 0) {
      val p = spark.sparkContext.defaultParallelism
      val nParts = math.max(1L, math.min(p.toLong, nNew / 500000L + 1L)).toInt
      finalLbl
        .repartition(nParts, col("id"))
        .write.mode("append").parquet(activeBase(spark, path))
    }
    if (composed != oldRemap) writeRemap(spark, path, composed)
  }

  /** Fold the remap into a fresh distinct base generation when it
    * exceeds `maxRemap` entries (the SpanStore compaction discipline —
    * the remap is collected driver-side at applyDelta time, so its
    * size must stay bounded). Returns true if compacted. */
  def compactIfNeeded(spark: SparkSession, path: String,
      maxRemap: Int = 100000, maxBaseFiles: Int = 512): Boolean = {
    // two triggers (review fix: the merge-sized remap no longer grows
    // with ingest, so it alone would never fire on a merge-light
    // stream while per-batch appends accumulate small files): fold
    // when the remap is big OR the base dir has fragmented
    val fileCount = {
      val p = new Path(activeBase(spark, path))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    }
    if (readRemap(spark, path).size <= maxRemap && fileCount <= maxBaseFiles)
      return false
    val gen = baseGen(spark, path)
    val next = s"$path/base-${"%03d".format(gen + 1)}"
    // resolved labels into the NEXT generation (overwrite handles an
    // orphan from a crashed prior attempt), then the atomic pointer
    // swing, then cleanup. Crash order is safe at every point: before
    // the swing readers see base-g ⋈ remap; after it they see the
    // resolved base-g+1 — and the stale remap is a NO-OP against it
    // (every remapped old label was just resolved away), so the remap
    // delete can trail the swing without a wrong-read window.
    read(spark, path)
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .write.mode("overwrite").parquet(next)
    writeBaseGen(spark, path, gen + 1)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(remapPath(path), false)
    fs.delete(new Path(s"$path/base-${"%03d".format(gen)}"), true)
    true
  }

  private def activeBase(spark: SparkSession, path: String): String =
    s"$path/base-${"%03d".format(baseGen(spark, path))}"

  private def genPath(path: String) = new Path(s"$path/_basegen")

  private def baseGen(spark: SparkSession, path: String): Long = {
    val p = genPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeBaseGen(spark: SparkSession, path: String, gen: Long): Unit = {
    val p = genPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path/._basegen.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def remapPath(path: String) = new Path(s"$path/_remap.tsv")

  /** The remap lives as ONE flat file ("old\tnew" lines): it is
    * composed driver-side on every applyDelta anyway, and a single
    * file is what rename-with-overwrite can swing atomically (a
    * parquet DIRECTORY can't be overwrite-renamed — the SpanStore
    * lesson is that the pointer-sized artifact must be the file). */
  private def readRemap(spark: SparkSession, path: String): Map[Long, Long] = {
    val p = remapPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val Array(o, n) = line.split('\t')
          o.toLong -> n.toLong
        }.toMap
      finally in.close()
    }
  }

  private def writeRemap(spark: SparkSession, path: String,
      remap: Map[Long, Long]): Unit = {
    val p = remapPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path/._remap.tsv.tmp")
    val out = fs.create(tmp, true)
    try remap.foreach { case (o, n) => out.write(s"$o\t$n\n".getBytes("UTF-8")) }
    finally out.close()
    // pointer-swing: rename-with-overwrite is the atomic primitive
    // (SpanStore.writeMeta discipline) — no window where a reader sees
    // base rows with a half-written remap
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
