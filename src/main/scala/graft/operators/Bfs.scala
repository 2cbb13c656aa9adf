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
    val e = edges.select(col(src).as("__u"), col(dst).as("__v"))
    var dist = seeds.toDF("v").distinct()
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
}
