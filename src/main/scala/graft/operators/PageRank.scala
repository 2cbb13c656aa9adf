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
  * destination id — both shuffles hash vertex ids and are
  * AQE-skew-splittable; ranks are |V|-sized, edges |E|-sized, nothing
  * is collected and the iteration count is a static plan unroll (no
  * driver-side data movement between rounds). At 100 TB-scale graphs
  * the rank vector stays partitioned by vertex id across iterations —
  * the same key every round, so a cluster reuses the exchange.
  *
  * Input is an UNDIRECTED edge list (the co-occurrence graphs the rest
  * of the catalog builds): each edge feeds both directions, so every
  * vertex has out-degree ≥ 1 and the dangling-mass term vanishes by
  * construction.
  */
object PageRank {

  val Scale = 1000000L

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
      weightCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"),
        col(weightCol).cast("long").as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
    val dir = e0.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionAll(e0.select(col("b").as("u"), col("a").as("v"), col("w")))
      .localCheckpoint(true)
    val wtot = dir.groupBy(col("u")).agg(sum(col("w")).as("wt"))
      .localCheckpoint(true)
    val init = wtot.select(col("u").as("v"), lit(Scale).as("pr"))
    (1 to iters).foldLeft(init) { (pr, _) =>
      val sums = dir
        .join(pr.select(col("v").as("u"), col("pr")), Seq("u"))
        .join(wtot, Seq("u"))
        .select(col("v"), expr("(pr * w) div wt").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      wtot.select(col("u").as("v"))
        .join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) + expr("(17 * coalesce(m, 0L)) div 20")).as("pr"))
    }
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
      seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = e0.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    val deg = dir.groupBy(col("u")).agg(cnt(lit(1)).as("d"))
      .localCheckpoint(true)
    val seed = deg.select(col("u"))
      .join(seeds.toDF("u").distinct(), Seq("u"), "left_semi")
      .withColumn("s", lit(1L))
      .localCheckpoint(true)
    val init = deg.select(col("u").as("v"))
      .join(seed.select(col("u").as("v"), col("s")), Seq("v"), "left")
      .select(col("v"), (coalesce(col("s"), lit(0L)) * Scale).as("pr"))
    (1 to iters).foldLeft(init) { (pr, _) =>
      val sums = dir
        .join(pr.select(col("v").as("u"), col("pr")), Seq("u"))
        .join(deg, Seq("u"))
        .select(col("v"), expr("pr div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      deg.select(col("u").as("v"))
        .join(seed.select(col("u").as("v"), col("s")), Seq("v"), "left")
        .join(sums, Seq("v"), "left")
        .select(col("v"),
          (coalesce(col("s"), lit(0L)) * 150000L +
            expr("(17 * coalesce(m, 0L)) div 20")).as("pr"))
    }
  }

  /** (v, pr) after `iters` rounds, over the undirected graph's
    * vertices; pr is at scale 10⁶ (10⁶ = the uniform start mass). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    // EAGER edge materialization (q32 pattern): dir and deg feed EVERY
    // iteration (the edge join + the degree join + the vertex base), so
    // without checkpoints the canonicalize + DISTINCT subtree re-runs
    // ~3× per round — measured 6.4 s → ~1 s for 4 rounds at sf0.1.
    // Blocks free when the result goes unreachable.
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = e0.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    val deg = dir.groupBy(col("u")).agg(cnt(lit(1)).as("d"))
      .localCheckpoint(true)
    val init = deg.select(col("u").as("v"), lit(Scale).as("pr"))
    (1 to iters).foldLeft(init) { (pr, _) =>
      val sums = dir
        .join(pr.select(col("v").as("u"), col("pr")), Seq("u"))
        .join(deg, Seq("u"))
        .select(col("v"), expr("pr div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      deg.select(col("u").as("v"))
        .join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) + expr("(17 * coalesce(m, 0L)) div 20")).as("pr"))
    }
  }
}
