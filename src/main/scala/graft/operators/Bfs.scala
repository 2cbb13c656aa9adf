package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance — "how far is every vertex from the
  * seed set": reachability radius, blast-radius analysis, related-item
  * expansion by degrees of separation.
  *
  * Frontier algorithm: round k joins the PREVIOUS frontier (vertices
  * first reached at k−1) to the directed edge list, anti-joins the
  * already-reached set, and tags survivors dist = k. Stops at the hop
  * cap OR at the fixed point (an empty frontier — the KCore/BpeTrain
  * early-stop discipline; the 1-row count that drives the gate is also
  * the round's lineage cut).
  *
  * Scale shape: every round is one equality join on vertex ids
  * (frontier ⋈ edges — frontier-sized probe side, broadcastable when
  * the frontier is small) plus one anti-join on the reached set; work
  * is frontier-sized, never graph-sized, and each round's result is
  * localCheckpoint'd so lineage stays flat (iterative-plan rule). Hop
  * distance is order-independent (min over path lengths), so the
  * result is partitioning- and schedule-invariant — the DuckDB twin
  * unrolls the same rounds declaratively and hash-matches.
  *
  * Cost gate (r10, the KCore/BpeTrain driver-finish pattern): a BFS
  * round at local/bench scale is JOB-COUNT-bound — ~3 scheduler floors
  * per hop against milliseconds of actual row work. When the edge list
  * fits `spark.graft.bfs.localEdgeMax` (default 4 M rows ≈ 64 MB), the
  * whole traversal runs driver-locally with the IDENTICAL round
  * algebra (level-synchronous frontier expansion, min-hop wins), so
  * the answer is bit-equal to the distributed unroll — BfsSpec pins
  * local ≡ distributed, and the gate count rides the edge list the
  * caller should already have checkpointed. At 100 TB the distributed
  * loop runs (edge count over the gate); set the conf to 0 to force it.
  */
object Bfs {

  /** @param edges directed edge list (for an undirected graph, pass
    *              both orientations)
    * @param seeds one column of seed vertex ids (dist 0)
    * @return (v, dist) — every vertex within `maxHops` of a seed, at
    *         its minimum hop distance
    */
  def hops(edges: DataFrame, src: String, dst: String, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(src).cast("long").as("__u"),
      col(dst).cast("long").as("__v"))
    val localMax = spark.conf.getOption("spark.graft.bfs.localEdgeMax")
      .map(_.toLong).getOrElse(4000000L)
    if (e.count() <= localMax) {
      val pairs = Csr.collectEdges(e, "__u", "__v")
      val seedArr = seeds.toDF("v").distinct()
        .select(col("v").cast("long"))
        .as(org.apache.spark.sql.Encoders.scalaLong).collect()
      val out = hopsLocal(pairs, seedArr, maxHops)
      System.err.println(s"[bfs] local traversal (${pairs.length} edges, " +
        s"${seedArr.length} seeds, ${out.length} reached)")
      import spark.implicits._
      return out.toSeq.toDF("v", "dist")
    }
    hopsDistributed(e, seeds, maxHops)
  }

  /** The r9 frontier-join loop — ground truth for BfsSpec's local ≡
    * distributed pin and the over-gate execution path. */
  private[operators] def hopsDistributed(e: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    var dist = seeds.toDF("v").distinct().select(col("v").cast("long"))
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = dist
    var k = 1
    var done = false
    while (k <= maxHops && !done) {
      val fresh = frontier.select(col("v").as("__u"))
        .join(e, Seq("__u"))
        .select(col("__v").as("v")).distinct()
        .join(dist, Seq("v"), "left_anti")
        .withColumn("dist", lit(k.toLong))
        .localCheckpoint(true)
      if (fresh.isEmpty) done = true // fixed point: nothing new reachable
      else {
        dist = dist.unionAll(fresh).localCheckpoint(true)
        frontier = fresh
      }
      k += 1
    }
    dist
  }

  /** Driver-local level-synchronous BFS, bit-equal to the frontier-join
    * loop: seeds are dist 0 (present in the output even when isolated),
    * each hop visits unreached out-neighbors of the previous frontier. */
  private def hopsLocal(pairs: Csr.Edges, seedArr: Array[Long],
      maxHops: Int): Array[(Long, Long)] = {
    // seeds interned too: an isolated seed still appears at dist 0
    val g = Csr.build(pairs, extra = seedArr)
    val n = g.n
    val dist = Array.fill(n)(-1L)
    var frontier = seedArr.map(g.verts.indexOf).distinct
    frontier.foreach(dist(_) = 0L)
    var k = 1
    while (k <= maxHops && frontier.nonEmpty) {
      val next = Array.newBuilder[Int]
      frontier.foreach { u =>
        var p = g.off(u)
        while (p < g.off(u + 1)) {
          val v = g.adj(p)
          if (dist(v) < 0) { dist(v) = k.toLong; next += v }
          p += 1
        }
      }
      frontier = next.result()
      k += 1
    }
    (0 until n).iterator.filter(dist(_) >= 0)
      .map(j => (g.names(j), dist(j))).toArray
  }
}
