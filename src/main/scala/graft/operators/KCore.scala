package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling (Seidman 1983 degeneracy cores): drop
  * every vertex with degree < k, recompute degrees on the induced
  * subgraph, repeat. The k-core is the fixed point; `rounds` bounds the
  * peels, and the loop STOPS EARLY at the fixed point (a round that
  * removes zero vertices — the BpeTrain cost-gate pattern): once nothing
  * peels, every further round is the identity, so "stop at the fixed
  * point" and "run exactly `rounds` peels" produce the SAME vertex set
  * whatever the convergence state (KCoreSpec pins early-stop ≡ full
  * unroll). That is what lets a SQL twin unroll the identical algebra
  * round for round while the engine skips the converged tail.
  *
  * Round shape (r10 rewrite — DELTA peeling): peeling is monotone and
  * after the first round the per-round removed set is typically TINY
  * (the q130 fixture peels a few hundred of 250 k directed edges per
  * round), so recomputing full degrees + two edge-size semi-joins per
  * round (the r9 form) pays three full exchanges to delete a handful of
  * rows. Instead each round now:
  *   1. removes = deg rows with d < k (materialized blocks, cheap count);
  *   2. lost(u)  = per-surviving-endpoint count of edges into removed
  *      vertices — one SMALL aggregation over only the removed-incident
  *      edge stream (broadcast hash join against the removed set);
  *   3. deg'     = deg ⟖anti removed, merged with −lost via a
  *      vertex-sized union+sum (the vertex table is orders smaller than
  *      the edge table at any scale);
  *   4. dir'     = dir ⟖anti removed on BOTH endpoints — broadcast
  *      anti-joins, so the edge table never re-shuffles after round 0.
  * deg'(u) = deg(u) − lost(u) is exactly the induced-subgraph degree
  * (an edge leaves u's count iff its other endpoint was removed; edges
  * with BOTH endpoints removed exit via the anti-join on u itself), so
  * delta ≡ recompute — KCoreSpec pins it against the naive form.
  * When a round's removed set exceeds `bcastMax` (first rounds of a
  * sparse-threshold peel at 100 TB can evict most of the graph), the
  * round falls back to the shuffle form: full degree recompute + two
  * edge-size semi-joins — correct at any cardinality, just not
  * broadcast-cheap. Both edge list and degree table are eagerly
  * localCheckpointed per round: round i's outputs are each referenced
  * 2–3× by round i+1, so an uncheckpointed unroll re-runs an
  * exponentially growing subtree; the broadcast-round checkpoints are
  * map-only jobs over the previous round's materialized blocks.
  */
object KCore {

  /** @param edges undirected edge list (duplicates/reversals/self-loops
    *              tolerated — canonicalized away first)
    * @return (v, core_deg): vertices surviving `rounds` peels at
    *         threshold k, with their degree inside the surviving
    *         induced subgraph. At the fixed point every core_deg >= k.
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame =
    peelImpl(canonical(edges, srcCol, dstCol), k, rounds,
      bcastMax = 4000000L)

  /** [[peel]] over a PREPARED (u, v) frame — both orientations of each
    * distinct undirected edge, no self-loops (e.g. a bucketed edge
    * landing): skips the canonicalize+distinct+checkpoint rebuild. */
  def peelOnPrepared(dir: DataFrame, k: Int, rounds: Int): DataFrame =
    peelImpl(dir.select(col("u"), col("v")), k, rounds,
      bcastMax = 4000000L)

  /** The r9 recompute-everything form, kept as the spec's ground truth
    * (KCoreSpec pins peel ≡ peelNaive on every fixture) and as the
    * fallback body for oversized rounds. */
  private[operators] def peelNaive(edges: DataFrame, srcCol: String,
      dstCol: String, k: Int, rounds: Int): DataFrame =
    peelImpl(canonical(edges, srcCol, dstCol), k, rounds, bcastMax = -1L)

  private def canonical(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    e0.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
  }

  private def peelImpl(dir0: DataFrame,
      k: Int, rounds: Int, bcastMax: Long): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 30, s"rounds=$rounds out of [1, 30]")
    val spark = dir0.sparkSession
    var dir = dir0
    // Cost gate (the BpeTrain driver-finish pattern, r8-mandated): a
    // peel iteration at local/bench scale is JOB-COUNT-bound — ~3
    // scheduler floors per round against ~10 ms of actual 254 k-row
    // work (measured r10: 2.2–2.6 s e2e either distributed form vs
    // 0.3 s local). When the directed edge list fits the gate
    // (`spark.graft.kcore.localEdgeMax`, default 4 M rows = ~64 MB),
    // finish the remaining rounds driver-locally with the IDENTICAL
    // synchronized-round algebra (each round removes every vertex with
    // d < k simultaneously, then applies the decrements), so a
    // budget-capped peel is bit-equal to the distributed unroll —
    // KCoreSpec pins local ≡ distributed on cascades, full evictions,
    // capped budgets, and the q130 fixture. At 100 TB the first
    // distributed rounds shrink the graph under the gate and the
    // converged tail stops paying per-round scheduling.
    val localMax = spark.conf.getOption("spark.graft.kcore.localEdgeMax")
      .map(_.toLong).getOrElse(4000000L)
    var deg = dir.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    var bcastRounds = 0
    while (round < rounds && !converged) {
      if (bcastMax >= 0 && dir.count() <= localMax) {
        val pairs = Csr.collectEdges(dir, "u", "v")
        val surv = peelLocal(pairs, k, rounds - round)
        System.err.println(s"[kcore] local finish after $round distributed " +
          s"rounds (${pairs.length} directed edges, ${surv.length} survivors)")
        import spark.implicits._
        return surv.toSeq.toDF("v", "core_deg")
      }
      val removed = deg.filter(col("d") < k).select(col("u"))
      val nRemoved = removed.count()
      if (nRemoved == 0L) {
        converged = true // zero vertices peeled -> every later round is identity
      } else if (bcastMax >= 0 && nRemoved <= bcastMax) {
        bcastRounds += 1
        val rmU = broadcast(removed)
        val rmV = broadcast(removed.select(col("u").as("v")))
        val lost = dir.join(rmV, Seq("v")).groupBy(col("u"))
          .agg(count(lit(1)).as("lost"))
        deg = deg.join(rmU, Seq("u"), "left_anti")
          .unionAll(lost.select(col("u"), (-col("lost")).as("d")))
          .groupBy(col("u")).agg(sum(col("d")).as("d"))
          .filter(col("d") > 0)
          .localCheckpoint(true)
        dir = dir.join(rmU, Seq("u"), "left_anti")
          .join(rmV, Seq("v"), "left_anti")
          .localCheckpoint(true)
      } else {
        val keep = deg.filter(col("d") >= k).select(col("u"))
        dir = dir
          .join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
          .localCheckpoint(true)
        deg = dir.groupBy(col("u")).agg(count(lit(1)).as("d"))
          .localCheckpoint(true)
      }
      round += 1
    }
    System.err.println(
      s"[kcore] ${if (converged) "fixed point" else "round budget"} after " +
        s"$round/$rounds rounds ($bcastRounds delta rounds)")
    deg.select(col("u").as("v"), col("d").as("core_deg"))
  }

  /** Driver-local synchronized-round peel — IDENTICAL round semantics
    * to the distributed loop (each round removes every vertex with
    * 0 < d < k simultaneously, then applies the degree decrements), so
    * a budget-capped local finish is bit-equal to the distributed
    * unroll. A vertex whose degree hits 0 without ever dipping into
    * (0, k) silently leaves the output — exactly the distributed
    * `d > 0` filter / recomputed-degree semantics.
    *
    * @param pairs directed edges, both directions present, distinct
    * @param budget remaining peel rounds
    * @return surviving (v, induced degree), deg > 0 */
  private def peelLocal(pairs: Csr.Edges, k: Int,
      budget: Int): Array[(Long, Long)] = {
    val g = Csr.build(pairs) // each undirected edge once per endpoint
    val n = g.n
    val deg = g.degrees
    val alive = Array.fill(n)(true)
    var round = 0
    var done = false
    val rm = new Array[Int](n)
    while (round < budget && !done) {
      var nrm = 0
      var j = 0
      while (j < n) {
        if (alive(j) && deg(j) > 0 && deg(j) < k) { rm(nrm) = j; nrm += 1 }
        j += 1
      }
      if (nrm == 0) done = true
      else {
        var r = 0
        while (r < nrm) { alive(rm(r)) = false; r += 1 }
        r = 0
        while (r < nrm) {
          val v = rm(r)
          var p = g.off(v)
          while (p < g.off(v + 1)) { deg(g.adj(p)) -= 1; p += 1 }
          r += 1
        }
        round += 1
      }
    }
    (0 until n).iterator
      .filter(j => alive(j) && deg(j) > 0)
      .map(j => (g.names(j), deg(j).toLong))
      .toArray
  }
}
