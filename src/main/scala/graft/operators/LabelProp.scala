package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007), made DETERMINISTIC: every vertex starts labeled with its own
  * id; each round ALL vertices simultaneously adopt the most frequent
  * label among their neighbors, ties broken toward the SMALLEST label.
  * Fixing the update order (synchronous) and the tie rule makes the
  * result a pure function of the graph — no randomness, so a SQL twin
  * can unroll the identical rounds and hash-match, and a re-run on
  * different partitioning produces the same communities. Bounded
  * `rounds` (LPA converges in a handful of sweeps; synchronous LPA can
  * 2-cycle on bipartite structures, which a fixed round budget also
  * neutralizes — the budget IS the semantics, like q118's fixed
  * PageRank unroll).
  *
  * Round shape: join labels onto the directed edge list's dst endpoint
  * (labels are vertex-keyed — the SMALL side at any scale), count
  * (u, lbl) pairs, then pick per-u argmax with the min-label tie via
  * one more hash aggregation of `max(struct(cnt, -lbl))` — partial-
  * aggregable, so a celebrity vertex's million neighbor-labels combine
  * map-side, never in one reducer. Per-round localCheckpoint keeps the
  * lineage flat (iterative-plan rule).
  *
  * Cost gate (KCore/BpeTrain discipline): under
  * `spark.graft.labelprop.localEdgeMax` (default 4 M directed edges)
  * the rounds run driver-locally with the identical synchronous
  * algebra — LabelPropSpec pins local ≡ distributed.
  */
object LabelProp {

  /** @param edges undirected edge list (canonicalized internally)
    * @return (v, community) after `rounds` synchronous sweeps */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = e0.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    runOnPrepared(dir, rounds)
  }

  /** [[run]] over a PREPARED (u, v) frame — both orientations of each
    * distinct undirected edge, no self-loops (e.g. a bucketed edge
    * landing): skips the canonicalize+distinct+checkpoint rebuild the
    * raw path pays per call. */
  def runOnPrepared(dir: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds=$rounds out of [1, 20]")
    val spark = dir.sparkSession
    val localMax = spark.conf.getOption("spark.graft.labelprop.localEdgeMax")
      .map(_.toLong).getOrElse(4000000L)
    if (dir.count() <= localMax) {
      val pairs = Csr.collectEdges(dir, "u", "v")
      val out = runLocal(pairs, rounds)
      System.err.println(s"[labelprop] local sweeps (${pairs.length} " +
        s"directed edges, $rounds rounds)")
      import spark.implicits._
      return out.toSeq.toDF("v", "community")
    }
    runDistributed(dir, rounds)
  }

  /** Ground truth for LabelPropSpec's local ≡ distributed pin and the
    * over-gate path. `dir` must hold both edge orientations — the
    * r15 round shape DEPENDS on it: each round joins the label vector
    * on the edge's SOURCE `u` and aggregates to `v` (for vertex w the
    * counted multiset {lbl(u) : (u,w) ∈ dir} equals the neighbor
    * multiset {lbl(x) : x ∈ N(w)} exactly because both orientations
    * are present — the same argument as PageRank's foldRanks). The
    * pre-r15 form joined on `v` and aggregated to `u`, which is the
    * NON-bucket side of the edge landing: every round paid TWO
    * |E|-sized exchanges (edge re-shuffle by v for the join + the
    * contribution shuffle). Joining on `u` — the landing's bucket/sort
    * key — leaves one: the edge side reads bucket-aligned with zero
    * exchange (the PageRankBucketedSpec property) and only the
    * partial-aggregated (v, lbl) contributions move. Algebra, tie rule
    * and vertex set are unchanged — LabelPropSpec's local ≡
    * distributed pin and the q139 oracle hash cover it. */
  private[operators] def runDistributed(dir: DataFrame,
      rounds: Int): DataFrame = {
    var labels = dir.select(col("u")).distinct()
      .withColumn("lbl", col("u"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      labels = dir
        .join(labels, Seq("u")) // source label rides the bucket key
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("w"))
        .select(col("v").as("u"), (-col("w.nl")).as("lbl"))
        .localCheckpoint(true)
      r += 1
    }
    labels.select(col("u").as("v"), col("lbl").as("community"))
  }

  /** Driver-local synchronous sweeps, bit-equal to the distributed
    * rounds: argmax neighbor-label frequency, min label on ties. */
  private def runLocal(pairs: Csr.Edges,
      rounds: Int): Array[(Long, Long)] = {
    val g = Csr.build(pairs)
    val n = g.n
    var lbl: Array[Long] = g.names.clone()
    var r = 0
    while (r < rounds) {
      val next = new Array[Long](n)
      val freq = new java.util.HashMap[Long, Int]()
      var v = 0
      while (v < n) {
        freq.clear()
        var p = g.off(v)
        while (p < g.off(v + 1)) {
          freq.merge(lbl(g.adj(p)), 1, Integer.sum(_, _))
          p += 1
        }
        var best = 0L
        var bestCnt = -1
        freq.forEach { (l, c) =>
          if (c > bestCnt || (c == bestCnt && l < best)) {
            best = l; bestCnt = c
          }
        }
        next(v) = best
        v += 1
      }
      lbl = next
      r += 1
    }
    (0 until n).iterator.map(j => (g.names(j), lbl(j))).toArray
  }
}
