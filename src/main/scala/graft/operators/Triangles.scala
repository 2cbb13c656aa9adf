package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}

/** Exact triangle counting by degree-ordered edge orientation — the
  * compact-forward algorithm (Latapy 2008; Suri & Vassilvitskii's MR
  * formulation): the graph-quality metric behind clustering
  * coefficients and community density, and the classic example of a
  * join that dies on skew unless oriented.
  *
  * Every undirected edge is oriented from its endpoint with the
  * smaller (degree, id) to the larger. Two facts make this the
  * scalable formulation:
  *  - each triangle appears exactly ONCE as an oriented wedge
  *    u→v, v→w closed by oriented edge u→w (the orientation is a total
  *    order, a triangle's three vertices have exactly one ascending
  *    arrangement), so no post-hoc ÷6;
  *  - every vertex's OUT-degree is O(√m) regardless of its true degree
  *    (a vertex with out-degree d has d higher-(degree,id) neighbors,
  *    each of degree ≥ d, which needs d² ≤ 2m edge endpoints) — the
  *    wedge join's per-key fan-out is bounded even on a power-law hub
  *    whose raw degree would square into oblivion.
  *
  * All joins are equality joins on vertex ids (hash-partitioned,
  * AQE-skew-splittable); nothing is collected and no adjacency list is
  * materialized per vertex.
  */
object Triangles {

  /** Count triangles in the undirected graph given as an edge list
    * (self-loops dropped, duplicate/reverse edges collapsed). Returns
    * one row: (n_vertices, n_edges, n_triangles).
    *
    * EAGER by documented contract (the q32/removeDuplicateSpans
    * pattern): the canonical edge list and the oriented edge list are
    * localCheckpointed at call time, because each feeds ≥ 3 consumers
    * (degrees + orientation + both wedge sides + the closure probe).
    * Without the checkpoints Spark re-derives the edge list — often a
    * join + DISTINCT over something much bigger — once per consumer:
    * measured 26.6 s → ~1 s at sf0.1 on the co-purchase graph. Blocks
    * are ContextCleaner-freed when the result goes unreachable. */
  def count(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // The kernel path below is monomorphic over LongType ids; a
    // non-integral id type (e.g. string ids) would cast to NULL and the
    // a =!= b filter would then silently DROP those edges (ADVICE r14).
    // Fail loudly instead: integral ids are the operator's contract.
    for (c <- Seq(srcCol, dstCol)) {
      import org.apache.spark.sql.types._
      val ok = edges.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"Triangles.count requires integral vertex ids; " +
        s"column '$c' is ${edges.schema(c).dataType}")
    }
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = e0.select(col("a").as("v"))
      .unionAll(e0.select(col("b").as("v")))
      .groupBy(col("v")).agg(cnt(lit(1)).as("d"))
    // orient by (degree, id): u -> w with (d_u, u) < (d_w, w)
    val oriented = e0
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("w"))
      .localCheckpoint(true)
    // r14: EDGE-ITERATOR over sorted adjacency arrays replaces the
    // wedge join + (u,w) closure semi-join. A triangle u→v, v→w closed
    // by u→w is counted exactly once at its base edge (u,v) as a member
    // of N+(u) ∩ N+(v) — same orientation algebra, same exact count
    // (TriProbe pins equality on the co-purchase graph at 1× and 10×;
    // AnalyticsOpsSpec pins K4/star/parity). Why it wins: the closure
    // probe shuffled |wedges| rows (Θ(Σ d_out²) — 10-50× |E| on dense
    // graphs); this shape shuffles only |E|+|V| rows and does the same
    // Θ(Σ d_out²) work per edge with no exchange. The per-vertex
    // arrays are out-degree-sized, O(√m) by the orientation bound, so
    // no hub array can exceed ~√(2m) entries — skew-safe by the same
    // argument as the wedge form. Measured (TriProbe, interleaved
    // medians): 9.07 → 6.60 s at the 10× graph (−27%), 1.07 → 0.99 s
    // at sf0.1.
    //
    // r14 second cut, two per-task savings on the same algebra:
    //  - the oriented edge list with N+(u) attached IS the exploded
    //    adjacency table (w ∈ nbrs_u by construction), so the first
    //    array-attach join disappears — explode(adj) replays each edge
    //    row with its source array already in hand, and only ONE join
    //    (N+(w) onto the edge's head) remains;
    //  - the per-edge intersection runs in the SortedIntersectCount
    //    codegen kernel (two-pointer walk over the already-sorted
    //    arrays) instead of size(array_intersect(...)), which built a
    //    hash set AND materialized the intersection array per edge only
    //    to discard it.
    // Same count on identical inputs (spec + TriProbe equality gate);
    // ids go through LongType so the kernel is monomorphic.
    val adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("w"))).as("nbrs"))
    val tris = adj
      .select(col("nbrs"), explode(col("nbrs")).as("w"))
      .join(adj.select(col("u").as("w"), col("nbrs").as("nbrs_w")),
        Seq("w"), "left")
      .select(coalesce(
        graft.functions.SortedArrayOps.sortedIntersectCount(
          col("nbrs"), col("nbrs_w")), lit(0L)).as("t"))
    val nv = deg.agg(cnt(lit(1)).as("n_vertices"))
    val ne = e0.agg(cnt(lit(1)).as("n_edges"))
    val nt = tris.agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
    nv.crossJoin(ne).crossJoin(nt)
  }
}
