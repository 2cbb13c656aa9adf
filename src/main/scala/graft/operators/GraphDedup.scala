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

    // Cost gate (r10, the KCore/Bfs driver-finish discipline): a
    // label-propagation round is 2 exchanges + a count — all scheduler
    // floor when the PAIR LIST is small, which for a near-dup component
    // graph it always is relative to the corpus (pairs are the
    // LSH-verified survivors, not documents). Under
    // `spark.graft.cc.localEdgeMax` (default 4 M directed edges) the
    // components come from a driver-local union-find — the same
    // (id, min-reachable-id) contract, order-invariant, spec-pinned
    // against both distributed forms. The gate count rides the
    // persisted edge list the loop was about to materialize anyway.
    val localMax = edges.sparkSession.conf
      .getOption("spark.graft.cc.localEdgeMax")
      .map(_.toLong).getOrElse(4000000L)
    if (e.count() <= localMax) {
      // primitive-array collect (r11 ADVICE): 16 bytes/edge, not the
      // ~100 bytes/edge a boxed tuple collect transiently costs
      val pairs = Csr.collectEdges(e, "e_src", "e_dst")
      e.unpersist()
      val out = ccLocal(pairs)
      System.err.println(s"[cc] local union-find (${pairs.length} directed " +
        s"edges, ${out.length} vertices)")
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("id", "component")
    }

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
    val raw = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // verts from the RAW edge list (self-loops included), so a vertex
    // whose only edge is a self-loop still labels itself — matching
    // [[connectedComponents]]' contract exactly (pre-r10 the star form
    // silently dropped such vertices; the local≡distributed pin
    // caught it)
    val verts = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id"))).distinct()
      .localCheckpoint(true)
    val e0 = raw.filter(col("u") =!= col("v"))

    var e = e0.distinct().localCheckpoint(true)
    // same cost gate as [[connectedComponents]] — the star rounds cost
    // 4 exchanges each, pure floor under the gate
    val localMax = edges.sparkSession.conf
      .getOption("spark.graft.cc.localEdgeMax")
      .map(_.toLong).getOrElse(4000000L)
    if (e.count() <= localMax) {
      val half = Csr.collectEdges(e, "u", "v")
      val vs = verts.as(org.apache.spark.sql.Encoders.scalaLong).collect()
      val linked = ccLocal(half.bothOrientations)
      val seen = linked.iterator.map(_._1).toSet
      val out = linked ++ vs.filterNot(seen).map(v => (v, v))
      System.err.println(s"[cc] local union-find, star form " +
        s"(${half.length} edges, ${out.length} vertices)")
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("id", "component")
    }
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

  /** Driver-local union-find with path halving: (id, component = min
    * vertex id in the set) for every vertex on at least one edge —
    * bit-equal to both distributed forms' contract, order-invariant.
    * @param pairs directed edges (both orientations or one — union is
    *              symmetric) */
  private def ccLocal(pairs: Csr.Edges): Array[(Long, Long)] = {
    val vs = Csr.intern(pairs)
    val n = vs.n
    val names = vs.names
    val parent = Array.tabulate(n)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    pairs.foreachEdge { (u, v) =>
      val ru = find(vs.indexOf(u))
      val rv = find(vs.indexOf(v))
      if (ru != rv) parent(ru) = rv
    }
    // component label = min vertex id in the set (values boxed
    // explicitly: a scala.Long value type would unbox absent keys to 0)
    val minOf = new java.util.HashMap[Integer, java.lang.Long]()
    var i = 0
    while (i < n) {
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || names(i) < cur.longValue())
        minOf.put(r, java.lang.Long.valueOf(names(i)))
      i += 1
    }
    (0 until n).iterator
      .map(j => (names(j), minOf.get(find(j)).longValue()))
      .toArray
  }
}
