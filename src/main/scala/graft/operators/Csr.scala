package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared driver-local graph kernel plumbing for the cost-gated
  * finishes (Bfs / KCore / LabelProp / GraphDedup): primitive edge
  * collection, vertex-id interning and CSR adjacency. Extracted r10
  * (review cleanup) — the four kernels carried four copies of this
  * boilerplate; the algorithms stay in their operators, only the
  * representation is shared.
  *
  * r11 (ADVICE): the kernels used to `collect()` boxed (Long, Long)
  * tuples — ~100 bytes/edge of transient driver heap, several hundred
  * MB at the 4 M-edge gate default. [[collectEdges]] instead pulls the
  * two columns through `queryExecution.toRdd` as primitive `getLong`
  * reads into flat long arrays, so the peak driver cost of a gated
  * finish is the 16 bytes/edge of the result itself (64 MB at the
  * gate) plus one transient per-partition chunk copy — no boxing at
  * any point.
  */
private[operators] object Csr {

  /** Directed edge list in structure-of-arrays form: edge i is
    * `src(i) -> dst(i)`. */
  final class Edges(val src: Array[Long], val dst: Array[Long]) {
    def length: Int = src.length
    @inline def foreachEdge(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < src.length) { f(src(i), dst(i)); i += 1 }
    }
    /** Both orientations of every edge (for callers holding one). */
    def bothOrientations: Edges = {
      val m = length
      val s = new Array[Long](2 * m)
      val d = new Array[Long](2 * m)
      System.arraycopy(src, 0, s, 0, m)
      System.arraycopy(dst, 0, d, 0, m)
      System.arraycopy(dst, 0, s, m, m)
      System.arraycopy(src, 0, d, m, m)
      new Edges(s, d)
    }
  }

  /** Collect `(c1, c2)` of `df` into primitive long arrays: the rows
    * stream through the executors as InternalRow `getLong` reads (zero
    * boxing), land as one flat chunk per partition, and concatenate
    * driver-side. Peak driver heap ≈ 2× the 16 bytes/edge result
    * (chunks + concatenated arrays), vs ~100 bytes/edge for a boxed
    * tuple collect. Columns must be non-null integral types — ENFORCED
    * (r12 ADVICE): `InternalRow.getLong` silently reads 0 for a NULL
    * slot, which would intern a phantom vertex 0 instead of failing;
    * the loop throws on a NULL endpoint, matching the loud behavior of
    * the encoder-based collect this replaced. */
  def collectEdges(df: DataFrame, c1: String, c2: String): Edges = {
    val plan = df.select(col(c1).cast("long"), col(c2).cast("long"))
    val chunks = plan.queryExecution.toRdd.mapPartitions { it =>
      val b = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        if (r.isNullAt(0) || r.isNullAt(1))
          throw new IllegalArgumentException(
            "Csr.collectEdges: NULL edge endpoint (documented non-null " +
              "precondition) — filter nulls before the kernel")
        b += r.getLong(0); b += r.getLong(1)
      }
      Iterator.single(b.result())
    }.collect()
    var total = 0
    chunks.foreach(c => total += c.length / 2)
    val src = new Array[Long](total)
    val dst = new Array[Long](total)
    var k = 0
    chunks.foreach { c =>
      var i = 0
      while (i < c.length) { src(k) = c(i); dst(k) = c(i + 1); k += 1; i += 2 }
    }
    new Edges(src, dst)
  }

  /** Interned vertex table: `names(i)` is the original id of index i. */
  final class Verts(val idx: java.util.HashMap[Long, Integer],
      val names: Array[Long]) {
    def n: Int = names.length
    def indexOf(v: Long): Int = idx.get(v).intValue()
    def contains(v: Long): Boolean = idx.containsKey(v)
  }

  /** Intern every endpoint of `pairs` (plus `extra` ids), first-seen
    * order — matching the inlined loops this replaces. */
  def intern(pairs: Edges,
      extra: Array[Long] = Array.emptyLongArray): Verts = {
    val idx = new java.util.HashMap[Long, Integer](pairs.length)
    def put(v: Long): Unit = if (!idx.containsKey(v)) idx.put(v, idx.size)
    pairs.foreachEdge { (u, v) => put(u); put(v) }
    extra.foreach(put)
    val names = new Array[Long](idx.size)
    idx.forEach((vid, i) => names(i) = vid)
    new Verts(idx, names)
  }

  /** Directed weighted edge list: edge i is `src(i) -w(i)-> dst(i)`. */
  final class WeightedEdges(val edges: Edges, val w: Array[Long])

  /** [[collectEdges]] plus a third non-null integral weight column,
    * same primitive streaming path (no boxing). */
  def collectWeightedEdges(df: DataFrame, c1: String, c2: String,
      cw: String): WeightedEdges = {
    val plan = df.select(col(c1).cast("long"), col(c2).cast("long"),
      col(cw).cast("long"))
    val chunks = plan.queryExecution.toRdd.mapPartitions { it =>
      val b = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
          throw new IllegalArgumentException(
            "Csr.collectWeightedEdges: NULL edge field (documented " +
              "non-null precondition) — filter nulls before the kernel")
        b += r.getLong(0); b += r.getLong(1); b += r.getLong(2)
      }
      Iterator.single(b.result())
    }.collect()
    var total = 0
    chunks.foreach(c => total += c.length / 3)
    val src = new Array[Long](total)
    val dst = new Array[Long](total)
    val w = new Array[Long](total)
    var k = 0
    chunks.foreach { c =>
      var i = 0
      while (i < c.length) {
        src(k) = c(i); dst(k) = c(i + 1); w(k) = c(i + 2); k += 1; i += 3
      }
    }
    new WeightedEdges(new Edges(src, dst), w)
  }

  /** CSR adjacency of the DIRECTED pairs over interned vertices:
    * out-neighbors of index i are `adj(off(i) until off(i + 1))`. */
  final class Graph(val verts: Verts, val off: Array[Int],
      val adj: Array[Int]) {
    def n: Int = verts.n
    def names: Array[Long] = verts.names
    /** fresh out-degree array (mutable per caller) */
    def degrees: Array[Int] =
      Array.tabulate(n)(i => off(i + 1) - off(i))
  }

  /** [[build]] carrying per-edge weights aligned with `adj` order:
    * weight of the edge at adjacency slot p is `wadj(p)`. */
  def buildWeighted(we: WeightedEdges): (Graph, Array[Long]) = {
    val pairs = we.edges
    val vs = intern(pairs)
    val n = vs.n
    val deg = new Array[Int](n)
    pairs.foreachEdge { (u, _) => deg(vs.indexOf(u)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val adj = new Array[Int](pairs.length)
    val wadj = new Array[Long](pairs.length)
    var e = 0
    while (e < pairs.length) {
      val ui = vs.indexOf(pairs.src(e))
      adj(fill(ui)) = vs.indexOf(pairs.dst(e))
      wadj(fill(ui)) = we.w(e)
      fill(ui) += 1
      e += 1
    }
    (new Graph(vs, off, adj), wadj)
  }

  def build(pairs: Edges,
      extra: Array[Long] = Array.emptyLongArray): Graph = {
    val vs = intern(pairs, extra)
    val n = vs.n
    val deg = new Array[Int](n)
    pairs.foreachEdge { (u, _) => deg(vs.indexOf(u)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val adj = new Array[Int](pairs.length)
    pairs.foreachEdge { (u, v) =>
      val ui = vs.indexOf(u)
      adj(fill(ui)) = vs.indexOf(v)
      fill(ui) += 1
    }
    new Graph(vs, off, adj)
  }
}
