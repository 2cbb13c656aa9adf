package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair list (the step after LSH/SimHash candidate verification in a
  * training-data dedup pipeline — each component keeps one
  * representative, so transitive duplicates A~B~C collapse even when
  * A,C were never compared directly).
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Each round
  * every vertex takes the minimum label among itself and its neighbors
  * — converges in O(component diameter) rounds; near-dup components are
  * dense (quasi-cliques), so the fixpoint lands in 2–3 rounds in
  * practice. Each round is one shuffle (join on vertex id + groupBy);
  * the convergence check is a driver-side count of changed labels.
  *
  * 100 TB notes: label state is 2 longs/vertex; the edge list dominates.
  * [[connectedComponents]] (min-label propagation) converges in
  * O(diameter) rounds — right for the dense quasi-clique components a
  * near-dup pipeline produces. [[connectedComponentsStar]] (alternating
  * large-star/small-star rounds, Kiveris et al., "Connected Components
  * in MapReduce and Beyond") converges in O(log n) rounds regardless of
  * diameter — the 100 TB path for graphs with long chains. Both return
  * the same (vertex → min-reachable-id) contract.
  */
object GraphDedup {

  /** Connected components of the undirected graph given as an edge list
    * (srcCol, dstCol: long ids). Returns (id, component) where component
    * is the minimum vertex id reachable from `id`. Vertices are those
    * appearing in at least one edge (isolated docs are their own
    * trivial component and never enter the pair list upstream).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("e_src"),
      col(dstCol).cast("long").as("e_dst"))
    val e = fwd.union(fwd.select(col("e_dst").as("e_src"), col("e_src").as("e_dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (eager) rather than persist: it truncates the
    // lineage each round, so the logical plan stays one-join deep
    // instead of growing with the iteration count (the analyzer cost of
    // an N-round persisted chain is superlinear in N). On a cluster
    // with a checkpoint dir, `checkpoint()` gives the same truncation
    // with fault tolerance.
    var labels = e.select(col("e_src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label over the neighborhood, then min with the own label
      val nbrMin = e.join(labels, col("e_dst") === col("id"))
        .groupBy(col("e_src")).agg(min(col("label")).as("nbr_min"))
      // The changed flag rides along in the propagation select, so the
      // convergence check is a filter+count over the just-materialized
      // checkpoint instead of an extra join+shuffle against the previous
      // labels.
      val next = labels
        .join(nbrMin, col("id") === col("e_src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label")).as("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    e.unpersist()
    // diameter > maxIter would silently return wrong (unconverged)
    // component labels — fall back to the star-rounds algorithm, which
    // converges in O(log n) rounds regardless of diameter. Near-dup
    // graphs are dense quasi-cliques so this path is cold; it only fires
    // on long-chain graphs (e.g. span-overlap chains).
    if (changed > 0) {
      org.apache.logging.log4j.LogManager.getLogger(getClass).info(
        s"connectedComponents: $changed labels still changing after " +
          s"$maxIter min-label rounds (graph diameter > maxIter); " +
          "falling back to star-rounds (O(log n))")
      connectedComponentsStar(edges, srcCol, dstCol)
    } else
      labels.select(col("id"), col("label").as("component"))
  }

  /** Large-star round: every node hangs its LARGER neighbors off the
    * minimum of its closed neighborhood — emits (v, min(N(u) ∪ u)) for
    * each v ∈ N(u), v > u. One groupBy + join-back shuffle pair. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbr = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
    nbr.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
      .distinct()
  }

  /** Small-star round: orient edges max→min, then every node hangs its
    * (all smaller) neighbors and itself off the neighborhood minimum —
    * emits (v, m) for v ∈ N(u) \ {m} plus (u, m). */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val joined = or.join(or.groupBy(col("u")).agg(min(col("v")).as("mn")), "u")
    joined.filter(col("v") =!= col("mn"))
      .select(col("v").as("u"), col("mn").as("v"))
      .union(joined.select(col("u"), col("mn").as("v")))
      .distinct()
  }

  /** Connected components via alternating large-star/small-star rounds
    * (Kiveris et al.) — O(log n) rounds regardless of graph diameter,
    * each round two join+groupBy shuffles over the (shrinking) edge
    * list. Same contract as [[connectedComponents]]: (id, component =
    * min reachable vertex id) for every vertex on at least one edge.
    *
    * Convergence test is a deterministic edge-set fingerprint
    * (count + xxhash64 bit-xor: order-insensitive, overflow-free under
    * ANSI) computed in the same action that materializes the round's
    * localCheckpoint — no extra pass. */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val verts = e0.select(col("u").as("id"))
      .union(e0.select(col("v").as("id"))).distinct()
      .localCheckpoint(true)

    var e = e0.distinct().localCheckpoint(true)
    var fp = (-1L, -1L)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      val next = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      converged = next == fp
      fp = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge after $maxIter rounds")
    // converged star edges point (node -> component root); roots and
    // isolated-within-edge-list vertices label themselves.
    verts.join(e, col("id") === col("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("component"))
  }
}
