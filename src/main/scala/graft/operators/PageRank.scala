package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}

/** PageRank in INTEGER fixed-point — the random-surfer centrality
  * (Brin & Page 1998) with every arithmetic step closed over BIGINT so
  * the result is bit-identical across engines and runs:
  *
  *   pr⁰(v)   = 10⁶                        (1.0 at scale 10⁶)
  *   contrib  = pr(u) div deg(u)           (integer floor division)
  *   prⁱ⁺¹(v) = 150000 + (17·Σ contrib) div 20
  *
  * i.e. damping 0.85 spelled as the exact rational 17/20 and the
  * per-edge share as floor division — no float accumulation anywhere,
  * so iteration order, partitioning, and engine cannot perturb the
  * result (floats would drift in the 15th digit and break a hash
  * compare; the DuckDB oracle twin unrolls the same algebra). The
  * truncation loses < 1 scale-unit (10⁻⁶) per division — bounded and
  * deterministic, not an approximation that compounds differently per
  * run.
  *
  * Shape per iteration: one equality join of the directed edge list
  * with the rank vector on the source id, one hash aggregation on the
  * destination id. With ad-hoc edges both shuffles hash vertex ids and
  * are AQE-skew-splittable. The 100 TB form (r11): land the edge list
  * ONCE bucketed+sorted on the source vertex (`Bucketed
  * .materializeOnce`) and run [[ranksOnPrepared]] — the bucket layout
  * IS the join's required distribution, so the |E|-sized side never
  * exchanges inside the loop; the only per-iteration shuffle left is
  * the |V|-sized contribution aggregation onto the destination key
  * (the mass movement itself — irreducible). PlanSpec pins zero
  * Exchange above the bucketed scan inside an iteration.
  *
  * Input is an UNDIRECTED edge list (the co-occurrence graphs the rest
  * of the catalog builds): each edge feeds both directions, so every
  * vertex has out-degree ≥ 1 and the dangling-mass term vanishes by
  * construction.
  */
object PageRank {

  val Scale = 1000000L

  /** Cost gate (r14, the KCore/LabelProp/Bfs discipline): a PageRank
    * iteration at bench scale is JOB-COUNT-bound — per round one join +
    * one aggregation + a localCheckpoint against microseconds of actual
    * integer work, ~0.2 s of scheduler floor × 4 rounds. Under
    * `spark.graft.pagerank.localEdgeMax` (default 4 M directed edges,
    * the same threshold the other graph kernels use ≈ 64 MB collected)
    * the rounds run driver-locally with the IDENTICAL BIGINT
    * floor-division algebra — integer sums are order-independent, so
    * local ≡ distributed BIT-FOR-BIT (PageRankBucketedSpec pins all
    * three variants; the q118/q128/q150 oracle hashes pin it at both
    * SFs). A non-positive localEdgeMax disables the gate (and skips its
    * count job) — the plan-shape specs use that to pin the distributed
    * loop. Both paths emit v as LongType (vertex ids are documented
    * integral; the distributed paths cast at output, a no-op for long
    * inputs), so the output schema is gate-INVARIANT — data growth
    * crossing the gate cannot flip a consumer's schema (ADVICE r14).
    *
    * Precondition for local ≡ distributed bit-equality: the prepared
    * frame carries BOTH orientations of every edge (the
    * [[directedEdges]] contract), so every vertex appears as a source.
    * On a general directed frame with sink-only vertices the local path
    * would intern (and rank) the sinks while the distributed loop's
    * vertex set is the out-degree keys — extra rows under the gate vs
    * over it (ADVICE r14). All catalog callers pass canonicalized
    * both-orientations frames.
    *
    * NOTE (ADVICE r14): this gate costs one `dir.count()` job, and the
    * local path then re-evaluates `dir` via collect — an un-checkpointed
    * caller of the OnPrepared entry points pays the edge-derivation
    * subtree twice (the ranks()/ranksWeighted() wrappers checkpoint
    * first; pass a checkpointed or landed frame). */
  private def underLocalGate(dir: DataFrame): Boolean = {
    val localMax = dir.sparkSession.conf
      .getOption("spark.graft.pagerank.localEdgeMax")
      .map(_.toLong).getOrElse(4000000L)
    localMax > 0 && dir.count() <= localMax
  }

  /** Canonicalize an undirected [weighted] edge list into the BOTH-
    * ORIENTATIONS directed form the iteration loops consume: (a, b)
    * with a<b, self-loops dropped, duplicates merged ([weight-sum] /
    * [distinct]), then each edge emitted u→v and v→u. This is the
    * frame to land bucketed on `u` for the exchange-free loop. */
  def directedEdges(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val e0 = weightCol match {
      case Some(w) =>
        edges.select(least(col(srcCol), col(dstCol)).as("a"),
            greatest(col(srcCol), col(dstCol)).as("b"),
            col(w).cast("long").as("w"))
          .filter(col("a") =!= col("b"))
          .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
      case None =>
        edges.select(least(col(srcCol), col(dstCol)).as("a"),
            greatest(col(srcCol), col(dstCol)).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
    }
    val cols = e0.columns.drop(2).map(col)
    e0.select(col("a").as("u") +: col("b").as("v") +: cols: _*)
      .unionAll(e0.select(col("b").as("u") +: col("a").as("v") +: cols: _*))
  }

  /** WEIGHTED integer PageRank — the general form for co-occurrence
    * graphs where edge multiplicity matters (a pair co-ordered 50
    * times should pull more mass than one co-ordered once):
    * contrib(u→v) = (pr(u)·w(u,v)) div W(u) with W(u) = u's total
    * incident weight — still pure BIGINT floor division, so the same
    * cross-engine determinism as [[ranks]] holds. Duplicate/reverse
    * input edges merge by weight-sum during canonicalization. Bound:
    * pr stays ≤ ~|V|·10⁶ and weights are corpus counts, so pr·w fits
    * BIGINT for any graph whose total weight is < ~10⁹ per vertex —
    * far beyond any per-entity co-occurrence table. */
  def ranksWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int): DataFrame =
    ranksWeightedOnPrepared(
      directedEdges(edges, srcCol, dstCol, Some(weightCol))
        .localCheckpoint(true),
      iters)

  /** [[ranksWeighted]] over a PREPARED (u, v, w) frame — both
    * orientations, merged weights, no self-loops; pass the bucketed
    * landing for the zero-edge-Exchange loop (object scaladoc). */
  def ranksWeightedOnPrepared(dir: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    if (underLocalGate(dir)) {
      val we = Csr.collectWeightedEdges(dir, "u", "v", "w")
      System.err.println(s"[pagerank] local weighted rounds " +
        s"(${we.edges.length} directed edges, $iters iters)")
      val spark = dir.sparkSession
      import spark.implicits._
      return ranksWeightedLocal(we, iters).toSeq.toDF("v", "pr")
    }
    // wtot derives exchange-free from a u-bucketed landing (groupBy on
    // the bucket key) and is |V|-sized — checkpointed once, it joins
    // co-partitioned in every round
    // r14 loop shape: the rank vector carries its vertex's total
    // incident weight, so each round is ONE contribution join + one
    // completion join (see [[foldRanks]]) — algebra unchanged.
    val wtot = dir.groupBy(col("u")).agg(sum(col("w")).as("wt"))
      .localCheckpoint(true)
    val wtotV = wtot.select(col("u").as("v"), col("wt"))
    val init = wtotV.select(col("v"), lit(Scale).as("pr"), col("wt"))
    val last = (1 to iters).foldLeft(init) { (rank, _) =>
      val sums = dir
        .join(rank.select(col("v").as("u"), col("pr"), col("wt")), Seq("u"))
        .select(col("v"), expr("(pr * w) div wt").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      wtotV.join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) + expr("(17 * coalesce(m, 0L)) div 20")).as("pr"),
          col("wt"))
    }
    // long cast = gate-invariant output schema (object scaladoc);
    // optimizer-eliminated when the ids are already long
    last.select(col("v").cast("long").as("v"), col("pr"))
  }

  /** PERSONALIZED integer PageRank (Page et al. 1999 §6; the
    * related-item expansion "relevance from these seeds" form): the
    * restart mass lands ONLY on the seed set —
    *   pr⁰(v)   = [v ∈ S]·10⁶
    *   prⁱ⁺¹(v) = [v ∈ S]·150000 + (17·Σ contrib) div 20
    * — same BIGINT-closed algebra as [[ranks]] (the DuckDB twin unrolls
    * it with the seed indicator as a LEFT-JOIN flag), so mass
    * concentrates around the seeds instead of spreading uniformly.
    * Seeds that aren't graph vertices contribute nothing (inner-join
    * semantics at init); the seed side is vertex-sized. */
  def ranksPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int): DataFrame =
    ranksPersonalizedOnPrepared(
      directedEdges(edges, srcCol, dstCol).localCheckpoint(true),
      seeds, iters)

  /** [[ranksPersonalized]] over a PREPARED (u, v[, w]) frame (weight
    * ignored — this is the unweighted recursion). */
  def ranksPersonalizedOnPrepared(dir: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    if (underLocalGate(dir)) {
      val pairs = Csr.collectEdges(dir.select(col("u"), col("v")), "u", "v")
      val seedIds = seeds.toDF("u").distinct()
        .select(col("u").cast("long")).collect().map(_.getLong(0))
      System.err.println(s"[pagerank] local personalized rounds " +
        s"(${pairs.length} directed edges, ${seedIds.length} seeds, " +
        s"$iters iters)")
      val spark = dir.sparkSession
      import spark.implicits._
      return ranksPersonalizedLocal(pairs, seedIds, iters)
        .toSeq.toDF("v", "pr")
    }
    // r14 loop shape (see [[foldRanks]]): the per-vertex statics —
    // out-degree AND the seed restart indicator — ride the rank vector
    // (seedV below is the one checkpointed (v, d, s) frame), so each
    // round is ONE contribution join + ONE completion join instead of
    // the old deg + seed + sums triple. Algebra unchanged.
    val deg = dir.groupBy(col("u")).agg(cnt(lit(1)).as("d"))
    val seedV = deg
      .join(seeds.toDF("u").distinct().withColumn("__s", lit(1L)),
        Seq("u"), "left")
      .select(col("u").as("v"), col("d"), coalesce(col("__s"), lit(0L)).as("s"))
      .localCheckpoint(true)
    val init = seedV.select(col("v"), (col("s") * Scale).as("pr"), col("d"))
    val last = (1 to iters).foldLeft(init) { (rank, _) =>
      val sums = dir
        .join(rank.select(col("v").as("u"), col("pr"), col("d")), Seq("u"))
        .select(col("v"), expr("pr div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      seedV.join(sums, Seq("v"), "left")
        .select(col("v"),
          (col("s") * 150000L +
            expr("(17 * coalesce(m, 0L)) div 20")).as("pr"),
          col("d"))
    }
    // long cast = gate-invariant output schema (object scaladoc)
    last.select(col("v").cast("long").as("v"), col("pr"))
  }

  /** (v, pr) after `iters` rounds, over the undirected graph's
    * vertices; pr is at scale 10⁶ (10⁶ = the uniform start mass).
    * EAGER edge materialization (q32 pattern): dir and deg feed EVERY
    * iteration, so without the checkpoint the canonicalize + DISTINCT
    * subtree re-runs ~3× per round — measured 6.4 s → ~1 s for 4
    * rounds at sf0.1. Callers with a LANDED edge table skip this and
    * use [[ranksOnPrepared]] directly. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame =
    ranksOnPrepared(
      directedEdges(edges, srcCol, dstCol).localCheckpoint(true),
      iters)

  /** [[ranks]] over a PREPARED (u, v[, w]) frame (weight ignored). */
  def ranksOnPrepared(dir: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    if (underLocalGate(dir)) {
      val pairs = Csr.collectEdges(dir.select(col("u"), col("v")), "u", "v")
      System.err.println(s"[pagerank] local rounds " +
        s"(${pairs.length} directed edges, $iters iters)")
      val spark = dir.sparkSession
      import spark.implicits._
      return ranksLocal(pairs, iters).toSeq.toDF("v", "pr")
    }
    val deg = dir.groupBy(col("u")).agg(cnt(lit(1)).as("d"))
      .localCheckpoint(true)
    foldRanks(dir, deg, iters)
  }

  /** Driver-local rounds, bit-equal to [[foldRanks]]: same BIGINT
    * floor-division recursion, integer sums are order-independent. */
  private[operators] def ranksLocal(pairs: Csr.Edges,
      iters: Int): Array[(Long, Long)] = {
    val g = Csr.build(pairs)
    val n = g.n
    var pr = Array.fill(n)(Scale)
    var r = 0
    while (r < iters) {
      val m = new Array[Long](n)
      var u = 0
      while (u < n) {
        val d = g.off(u + 1) - g.off(u)
        if (d > 0) {
          val c = pr(u) / d
          var p = g.off(u)
          while (p < g.off(u + 1)) { m(g.adj(p)) += c; p += 1 }
        }
        u += 1
      }
      var v = 0
      while (v < n) { m(v) = 150000L + (17L * m(v)) / 20L; v += 1 }
      pr = m
      r += 1
    }
    (0 until n).iterator.map(i => (g.names(i), pr(i))).toArray
  }

  /** Driver-local weighted rounds, bit-equal to
    * [[ranksWeightedOnPrepared]]'s loop: contrib per edge is
    * (pr(u)·w_e) div W(u), W(u) = total incident weight. */
  private[operators] def ranksWeightedLocal(we: Csr.WeightedEdges,
      iters: Int): Array[(Long, Long)] = {
    val (g, wadj) = Csr.buildWeighted(we)
    val n = g.n
    val wt = new Array[Long](n)
    var u0 = 0
    while (u0 < n) {
      var p = g.off(u0)
      while (p < g.off(u0 + 1)) { wt(u0) += wadj(p); p += 1 }
      u0 += 1
    }
    var pr = Array.fill(n)(Scale)
    var r = 0
    while (r < iters) {
      val m = new Array[Long](n)
      var u = 0
      while (u < n) {
        if (wt(u) > 0) {
          var p = g.off(u)
          while (p < g.off(u + 1)) {
            m(g.adj(p)) += pr(u) * wadj(p) / wt(u)
            p += 1
          }
        }
        u += 1
      }
      var v = 0
      while (v < n) { m(v) = 150000L + (17L * m(v)) / 20L; v += 1 }
      pr = m
      r += 1
    }
    (0 until n).iterator.map(i => (g.names(i), pr(i))).toArray
  }

  /** Driver-local personalized rounds, bit-equal to
    * [[ranksPersonalizedOnPrepared]]'s loop: restart mass only on
    * seeds that are graph vertices (non-vertex seeds contribute
    * nothing, matching the left-join indicator). */
  private[operators] def ranksPersonalizedLocal(pairs: Csr.Edges,
      seedIds: Array[Long], iters: Int): Array[(Long, Long)] = {
    val g = Csr.build(pairs)
    val n = g.n
    val s = new Array[Long](n)
    seedIds.foreach { sd =>
      if (g.verts.contains(sd)) s(g.verts.indexOf(sd)) = 1L
    }
    var pr = Array.tabulate(n)(i => s(i) * Scale)
    var r = 0
    while (r < iters) {
      val m = new Array[Long](n)
      var u = 0
      while (u < n) {
        val d = g.off(u + 1) - g.off(u)
        if (d > 0) {
          val c = pr(u) / d
          var p = g.off(u)
          while (p < g.off(u + 1)) { m(g.adj(p)) += c; p += 1 }
        }
        u += 1
      }
      var v = 0
      while (v < n) { m(v) = s(v) * 150000L + (17L * m(v)) / 20L; v += 1 }
      pr = m
      r += 1
    }
    (0 until n).iterator.map(i => (g.names(i), pr(i))).toArray
  }

  /** One-join-per-iteration variant (r14): the rank vector CARRIES its
    * vertex's out-degree, so the loop's contribution join needs no
    * second deg lookup, and the round-close completion join re-attaches
    * d from the checkpointed degree frame while it fills the damping
    * default — 2 joins per round instead of 3 (the per-round broadcast
    * build of deg was pure stage latency at bench scale, and at cluster
    * scale one fewer |V|-row hash relation per round). Algebra is
    * UNCHANGED — same BIGINT floor-division recursion, same vertex
    * completion — so results are bit-identical to [[ranksOnPrepared]]
    * (PageRankBucketedSpec parity test + the q118 oracle hash pin
    * both cover it). */
  private[operators] def foldRanks(dir: DataFrame, deg: DataFrame,
      iters: Int): DataFrame = {
    val degV = deg.select(col("u").as("v"), col("d"))
    val init = degV.select(col("v"), lit(Scale).as("pr"), col("d"))
    val last = (1 to iters).foldLeft(init) { (rank, _) =>
      val sums = dir
        .join(rank.select(col("v").as("u"), col("pr"), col("d")), Seq("u"))
        .select(col("v"), expr("pr div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      degV.join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) + expr("(17 * coalesce(m, 0L)) div 20")).as("pr"),
          col("d"))
    }
    // long cast = gate-invariant output schema (object scaladoc)
    last.select(col("v").cast("long").as("v"), col("pr"))
  }
}
