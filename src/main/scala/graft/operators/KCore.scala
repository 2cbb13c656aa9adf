package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling (Seidman 1983 degeneracy cores): drop
  * every vertex with degree < k, recompute degrees on the induced
  * subgraph, repeat. The k-core is the fixed point; `rounds` bounds the
  * peels, and the loop STOPS EARLY at the fixed point (a round that
  * removes zero edges — the BpeTrain cost-gate pattern): once nothing
  * peels, every further round is the identity, so "stop at the fixed
  * point" and "run exactly `rounds` peels" produce the SAME vertex set
  * whatever the convergence state (KCoreSpec pins early-stop ≡ full
  * unroll). That is what lets a SQL twin unroll the identical algebra
  * round for round while the engine skips the converged tail — on the
  * q130 fixture the peel converges in 2 of the 8 budgeted rounds.
  *
  * Scale shape per round: one hash aggregation (degrees) + two
  * semi-joins of the edge list against the surviving-vertex set — all
  * keyed on vertex ids, AQE-skew-splittable, nothing driver-side. The
  * edge list is eagerly localCheckpointed per round: round i's edges
  * are referenced three times by round i+1 (degree count + both
  * endpoint filters), so an uncheckpointed unroll re-runs an
  * exponentially growing subtree; the checkpoint makes each round one
  * small job over materialized blocks and keeps the final plan flat.
  * The convergence probe is a count over those just-materialized
  * blocks — metadata-cheap next to the checkpoint job it rides.
  * Peeling is monotone — each round's edge set shrinks — so the
  * per-round cost only falls.
  */
object KCore {

  /** @param edges undirected edge list (duplicates/reversals/self-loops
    *              tolerated — canonicalized away first)
    * @return (v, core_deg): vertices surviving `rounds` peels at
    *         threshold k, with their degree inside the surviving
    *         induced subgraph. At the fixed point every core_deg >= k.
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 30, s"rounds=$rounds out of [1, 30]")
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    var dir = e0.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var m = dir.count()
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      val keep = dir.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("u"))
      dir = dir
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .localCheckpoint(true)
      val m2 = dir.count()
      converged = m2 == m // zero edges peeled -> every later round is identity
      m = m2
      round += 1
    }
    System.err.println(
      s"[kcore] ${if (converged) "fixed point" else "round budget"} after " +
        s"$round/$rounds rounds (directed edges left: $m)")
    dir.groupBy(col("u").as("v")).agg(count(lit(1)).as("core_deg"))
  }
}
