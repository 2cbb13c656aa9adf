package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps.{vectorDot, vectorNorm}

/** Similarity-search operators over an (id, vector) DataFrame — the
  * library form of the ANN suite (SURVEY.md 2.C q30/q35/q36), built on
  * the codegen vector kernels. The oracle queries delegate here, so the
  * library paths are hash-verified against DuckDB each round.
  *
  * Scale shape: the query side is always broadcast (one row or a small
  * probe set); the base side streams through a single narrow pass. The
  * IVF variant prunes that pass to the probed clusters — the 100 TB
  * path, where brute force means reading every vector.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column =
    vectorDot(a, b) / (vectorNorm(a) * vectorNorm(b))

  /** Exact brute-force cosine top-k of `queryVec` (a 1-row DataFrame
    * with column `qv`) against base (idCol, vecCol).
    * @param scoreT transform applied to the raw cosine BEFORE ranking
    *   (e.g. a decimal rendering) — ordering follows the transformed
    *   score so rendered ties rank deterministically. */
  def cosineTopK(base: DataFrame, idCol: String, vecCol: String,
      queryVec: DataFrame, k: Int,
      scoreT: Column => Column = identity): DataFrame =
    base.crossJoin(broadcast(queryVec))
      .select(col(idCol), scoreT(cosine(col(vecCol), col("qv"))).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Near-duplicate pairs by cosine >= minCosine: norms computed once per
    * vector BEFORE the pair join (O(n·d)), one dot product per pair.
    *
    * This is the EXACT ALL-PAIRS form — O(n²) by definition — so it
    * REFUSES inputs above `maxRows`. The bound rides IN the plan as a
    * 1-row broadcast guard (count + raise_error), so construction stays
    * lazy (no eager pre-scan at DataFrame-build time) and an over-bound
    * input fails when the job runs, as the guard broadcast materializes
    * — before any pair work streams. For unbounded inputs use
    * [[nearDupPairsBucketed]], which generates candidates from a
    * bucket-equality join instead of the cross product. */
  def nearDupPairs(base: DataFrame, idCol: String, vecCol: String,
      minCosine: Column,
      scoreT: Column => Column = identity,
      maxRows: Long = 100000L): DataFrame = {
    require(maxRows >= 1 && maxRows < Int.MaxValue,
      s"maxRows must be in [1, ${Int.MaxValue - 1}], got $maxRows")
    val guard = base.agg(count(lit(1)).as("__n"))
      .select(when(col("__n") <= maxRows, col("__n"))
        .otherwise(raise_error(concat(
          lit(s"nearDupPairs is exact all-pairs (O(n^2)) and refuses > $maxRows rows (got "),
          col("__n").cast("string"),
          lit("); pre-bucket the input or use nearDupPairsBucketed")))).as("__n"))
    val e = base.select(col(idCol), col(vecCol).as("v"),
      vectorNorm(col(vecCol)).as("nrm"))
    val a = e.select(col(idCol).as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("j"), col("v").as("vb"), col("nrm").as("nb"))
    // the join condition references __n so column pruning can never
    // drop the guard projection (and its raise_error) from the plan
    a.crossJoin(broadcast(guard))
      .join(broadcast(b), col("i") < col("j") && col("__n") >= 0L)
      .select(col("i"), col("j"),
        scoreT(vectorDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** Scale-path near-duplicate pairs: candidates come from EQUALITY on a
    * [[hyperplaneBucket]] id (both sides co-shuffled by bucket — the
    * same candidate machinery as [[lshTopKBatch]]), then the exact
    * cosine cut. Never materializes the cross product, so it runs at
    * any scale; the trade is recall (a qualifying pair whose members
    * land in different buckets is missed — union several seedOffset
    * calls to recover, the standard LSH lever). Every emitted pair is
    * exact: scores are identical to [[nearDupPairs]]'s on the shared
    * candidate set. */
  def nearDupPairsBucketed(base: DataFrame, idCol: String, vecCol: String,
      minCosine: Column, nBits: Int, dim: Int, seedOffset: Int = 0,
      scoreT: Column => Column = identity): DataFrame = {
    val e = base.select(col(idCol), col(vecCol).as("v"),
      vectorNorm(col(vecCol)).as("nrm"),
      hyperplaneBucket(col(vecCol), nBits, dim, seedOffset).as("__bkt"))
    val a = e.select(col(idCol).as("i"), col("v").as("va"),
      col("nrm").as("na"), col("__bkt").as("__ba"))
    val b = e.select(col(idCol).as("j"), col("v").as("vb"),
      col("nrm").as("nb"), col("__bkt").as("__bb"))
    a.join(b, col("__ba") === col("__bb") && col("i") < col("j"))
      .select(col("i"), col("j"),
        scoreT(vectorDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** Random-hyperplane LSH bucket (sign-bit sketch over deterministic
    * integer hyperplanes): bit i is the sign of <v, w_{seedOffset+i}>,
    * with w_b[t] = ((b·131 + t·137) mod 19) − 9. Integer weights widen
    * exactly to double, and the dot is the same left-to-right fold as
    * the other kernels, so buckets are bit-portable across engines.
    * Multi-table ANN uses several calls with different seedOffsets and
    * unions the bucket matches — the standard recall lever. */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int, seedOffset: Int = 0): Column =
    (0 until nBits).map { i =>
      val b = seedOffset + i
      val w = array((0 until dim).map(t =>
        lit((((b * 131 + t * 137) % 19) - 9).toDouble)): _*)
      when(vectorDot(vec, w) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Batch-probe LSH ANN — the probe-SET shape of hyperplane-bucket ANN
    * (a 100 TB probe sweep is this, never one scan per probe): corpus
    * and probe set each carry their [[hyperplaneBucket]] id, candidates
    * come from a bucket-EQUALITY join (both sides co-shuffled by
    * bucket id), and the exact-cosine rerank keeps top-k per probe via
    * a probe-partitioned window — no global order, no per-probe pass,
    * no BroadcastNestedLoop over the corpus. Probes sharing a bucket
    * with nothing return no rows (the standard LSH recall trade;
    * unioning several seedOffset tables is the recall lever). */
  def lshTopKBatch(base: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      k: Int, nBits: Int, dim: Int, seedOffset: Int = 0,
      scoreT: Column => Column = identity): DataFrame = {
    val cb = base.select(col(idCol), col(vecCol).as("__bv"),
      hyperplaneBucket(col(vecCol), nBits, dim, seedOffset).as("__bkt"))
    val pb = probes.select(col(probeIdCol), col(probeVecCol).as("__pv"),
      hyperplaneBucket(col(probeVecCol), nBits, dim, seedOffset).as("__pbkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(probeIdCol))
      .orderBy(col("score").desc, col(idCol))
    cb.join(pb, col("__bkt") === col("__pbkt") && col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol), col(idCol),
        scoreT(cosine(col("__bv"), col("__pv"))).as("score"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** MULTI-PROBE batch LSH ANN (r12, verdict item 5 — the oracled
    * operating point a user would actually run): each probe examines
    * its own hyperplane bucket PLUS every Hamming-1 neighbor (one sign
    * bit flipped) — the buckets a true neighbor most likely fell into
    * when it straddled exactly one hyperplane. This is the standard
    * multi-probe recall lever (Lv et al., VLDB 2007): recall rises
    * ~3-4× over single-bucket at (nBits+1)/2^nBits scanned fraction,
    * with NO extra tables and no extra corpus passes.
    *
    * Scale shape: identical to [[lshTopKBatch]] — the PROBE side
    * explodes to nBits+1 bucket rows (tiny), the corpus side still
    * carries exactly one bucket id per vector, and candidates come from
    * the same bucket-EQUALITY join (co-shuffled, never a scan). The
    * probed buckets are pairwise distinct by construction (distinct
    * XOR masks), so no candidate duplicates exist and no dedup pass is
    * needed. `hamming` widens the probe ring: all buckets within that
    * Hamming distance of the probe's own — C(nBits,0..hamming) buckets,
    * the recall-vs-scan dial. */
  def lshTopKMultiProbe(base: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      k: Int, nBits: Int, dim: Int, seedOffset: Int = 0,
      hamming: Int = 1,
      scoreT: Column => Column = identity): DataFrame = {
    val cb = base.select(col(idCol), col(vecCol).as("__bv"),
      hyperplaneBucket(col(vecCol), nBits, dim, seedOffset).as("__bkt"))
    val pbkt = hyperplaneBucket(col(probeVecCol), nBits, dim, seedOffset)
    val probed = array(probeMasks(nBits, hamming).map(m =>
      pbkt.bitwiseXOR(lit(m))): _*)
    val pb = probes.select(col(probeIdCol), col(probeVecCol).as("__pv"),
      explode(probed).as("__pbkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(probeIdCol))
      .orderBy(col("score").desc, col(idCol))
    cb.join(pb, col("__bkt") === col("__pbkt") && col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol), col(idCol),
        scoreT(cosine(col("__bv"), col("__pv"))).as("score"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** All XOR masks of popcount ≤ hamming over nBits bits, ascending —
    * the probe ring of [[lshTopKMultiProbe]], exposed so the oracle
    * twin can inline the identical mask list. */
  def probeMasks(nBits: Int, hamming: Int): Seq[Long] =
    (0L until (1L << nBits))
      .filter(m => java.lang.Long.bitCount(m) <= hamming)

  /** Nearest-centroid assignment carrying the vector through — the
    * shared kernel of [[ivfTopK]] and [[kmeansStep]].
    *
    * r15: per-row argmax via the [[graft.functions.NearestCentroid]]
    * codegen expression over the collected+broadcast centroid matrix,
    * replacing the r14 crossJoin(broadcast) + map-side max_by shape.
    * The expansion form paid C generated rows, C struct allocations and
    * C hash-agg probes per vector plus an n-row exchange (the groupBy),
    * and recomputed both norms per pair; the kernel computes |v| once
    * per row, |c| once per centroid, and emits exactly one row per
    * vector with NO aggregation and NO exchange. The centroid side was
    * already driver-collected by the broadcast, so the scale contract
    * is unchanged (centroids must be broadcast-sized). Tie-break
    * replicates max (cos, −cid) — highest cosine then smallest cid,
    * NaN-greatest and ±0.0-equal like Spark's double ordering
    * (NearestCentroidSpec pins kernel ≡ expansion on ties, NaN, float
    * and double inputs). */
  private def assignToCentroids(base: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val bc = graft.functions.NearestCentroid.broadcastCentroids(centroids)
    base.select(col(idCol),
      graft.functions.NearestCentroid.nearestCentroid(col(vecCol), bc)
        .getField("cid").as("acid"),
      col(vecCol).as("__v"))
  }

  /** One Lloyd k-means update step in exact fixed-point arithmetic:
    * assign each vector to its nearest centroid by cosine, then emit the
    * per-(cluster, dimension) assigned count and component sum scaled to
    * 1e-6 fixed point (floor(x·1e6 + 0.5) per component — portable
    * round-half-up, so the sums are order-independent BIGINTs rather
    * than engine-order-sensitive double sums). The updated centroid is
    * sx_1e6 / (n·1e6); a training loop iterates this step, broadcasting
    * the result back as the next round's centroid dim. Scale shape: the
    * only shuffles are the n-row assignment exchange and the
    * (k·dim)-row update groupBy — both tiny next to the narrow scoring
    * pass. */
  def kmeansStep(base: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignToCentroids(base, idCol, vecCol, centroids)
      .select(col("acid").as("cid"), posexplode(col("__v")).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * 1e6 + 0.5).cast("long"))
      .groupBy(col("cid"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx_1e6"))

  /** Full Lloyd training loop over [[kmeansStep]] — the "trained
    * offline" step the IVF index assumes, iterated to `iters` rounds:
    * each round reassigns vectors to their nearest current centroid and
    * replaces every non-empty centroid with its cluster mean
    * (sx_1e6 / (n·1e6) per component — one exact IEEE divide of exact
    * integers, so the updated centroids are bit-identical across
    * engines and the loop's algebra stays oracle-checkable). Empty
    * clusters keep their previous centroid. Returns the final (cid, cv)
    * dim, `localCheckpoint`ed each round so the k×dim result is
    * materialized and the lineage never stacks `iters` plans deep —
    * the centroid dim stays a broadcast-sized input to the next round's
    * narrow scoring pass, which is the only per-round full-data work. */
  def kmeansTrain(base: DataFrame, idCol: String, vecCol: String,
      initCentroids: DataFrame, iters: Int): DataFrame = {
    var cent = initCentroids
    for (_ <- 1 to iters) {
      val upd = kmeansStep(base, idCol, vecCol, cent)
        .withColumn("x",
          col("sx_1e6").cast("double") / (col("n").cast("double") * 1e6))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
        .select(col("cid"),
          transform(col("px"), s => s.getField("x")).as("__ncv"))
      cent = cent.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("__ncv"), col("cv")).as("cv"))
        .localCheckpoint(eager = true)
    }
    cent
  }

  /** SemDeDup-style semantic deduplication (cluster-then-prune, after
    * Abbas et al. 2023, arXiv:2303.09540): assign every vector to its
    * nearest centroid, then within each cluster mark as duplicates the
    * non-minimal members of every pair whose cosine clears `minCosine`.
    * The clustering is the method's scale lever: pair candidates come
    * from EQUALITY on the assigned cluster id (both sides co-shuffled
    * on it), so pair work is O(Σ|cluster|²) — bounded by clustering
    * granularity, set by the centroid count — never corpus-O(n²). The
    * assignment pass feeds three consumers, so it is localCheckpointed
    * once (same contract as [[kmeansTrain]]'s rounds: batch inputs,
    * materialized at call time). Returns (idCol, cid, keep∈{0,1})
    * covering every input vector; keep=1 rows are the deduplicated
    * corpus — a duplicate survives only as the smallest id of its
    * qualifying pairs, matching the common "keep first" policy.
    *
    * Skew contract: per-cluster pair work is quadratic in CLUSTER size,
    * so callers own the clustering granularity — centroid count must
    * grow with the corpus (ScaleProbe pins this rule: scaled centroids
    * keep the curve linear), and a pathologically hot cluster is fixed
    * by subclustering (finer centroids there), not by this operator.
    * The contract is ENFORCED: any cluster above `maxClusterRows`
    * refuses loudly (the [[nearDupPairs]] contract) instead of quietly
    * going quadratic. The occupancy check is one tiny aggregate over
    * the just-materialized checkpoint blocks — this operator is already
    * eager at call time by documented contract, so no extra source scan
    * and no laziness lost. */
  def semanticDedup(base: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, minCosine: Column,
      scoreT: Column => Column = identity,
      maxClusterRows: Long = 100000L): DataFrame = {
    val asg = assignToCentroids(base, idCol, vecCol, centroids)
      .localCheckpoint(eager = true)
    val hot = asg.groupBy(col("acid")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxClusterRows)
      .orderBy(col("__c").desc).limit(1).collect()
    require(hot.isEmpty,
      s"semanticDedup: cluster ${if (hot.nonEmpty) hot.head.get(0) else ""} holds " +
        s"${if (hot.nonEmpty) hot.head.getLong(1) else 0L} vectors " +
        s"(> maxClusterRows = $maxClusterRows) — pair work is |cluster|^2; " +
        "use finer centroids (subcluster the hot region) or raise the bound deliberately")
    val a = asg.select(col(idCol).as("__i"), col("acid").as("__ca"),
      col("__v").as("__va"))
    val b = asg.select(col(idCol).as("__j"), col("acid").as("__cb"),
      col("__v").as("__vb"))
    val dup = a.join(b, col("__ca") === col("__cb") && col("__i") < col("__j"))
      .filter(scoreT(cosine(col("__va"), col("__vb"))) >= minCosine)
      .select(col("__j")).distinct()
    asg.join(dup, col(idCol) === col("__j"), "left")
      .select(col(idCol), col("acid").as("cid"),
        when(col("__j").isNull, 1L).otherwise(0L).as("keep"))
  }

  /** IVF-pruned ANN: assign base vectors to their nearest centroid
    * ([[assignToCentroids]]), probe the nprobe centroids closest to the
    * query, brute-force only inside the probed clusters. Centroids are
    * a small broadcast dim (trained offline — [[kmeansStep]]; any
    * deterministic selection works for the assignment algebra). */
  def ivfTopK(base: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryVec: DataFrame, k: Int, nprobe: Int,
      scoreT: Column => Column = identity): DataFrame = {
    val asg = assignToCentroids(base, idCol, vecCol, centroids)
    val probe = centroids.crossJoin(broadcast(queryVec))
      .select(col("cid"), cosine(col("cv"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("cid"))
      .limit(nprobe)
      .select(col("cid").as("pcid"))
    asg.join(broadcast(probe), col("acid") === col("pcid"))
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), scoreT(cosine(col("__v"), col("qv"))).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
