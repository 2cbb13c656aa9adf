package graft.operators

/** Shared driver-local graph kernel plumbing for the cost-gated
  * finishes (Bfs / KCore / LabelProp / GraphDedup): vertex-id interning
  * and CSR adjacency over a collected directed edge array. Extracted
  * r10 (review cleanup) — the four kernels carried four copies of this
  * boilerplate; the algorithms stay in their operators, only the
  * representation is shared. */
private[operators] object Csr {

  /** Interned vertex table: `names(i)` is the original id of index i. */
  final class Verts(val idx: java.util.HashMap[Long, Integer],
      val names: Array[Long]) {
    def n: Int = names.length
    def indexOf(v: Long): Int = idx.get(v).intValue()
    def contains(v: Long): Boolean = idx.containsKey(v)
  }

  /** Intern every endpoint of `pairs` (plus `extra` ids), first-seen
    * order — matching the inlined loops this replaces. */
  def intern(pairs: Array[(Long, Long)],
      extra: Array[Long] = Array.emptyLongArray): Verts = {
    val idx = new java.util.HashMap[Long, Integer](pairs.length)
    def put(v: Long): Unit = if (!idx.containsKey(v)) idx.put(v, idx.size)
    pairs.foreach { case (u, v) => put(u); put(v) }
    extra.foreach(put)
    val names = new Array[Long](idx.size)
    idx.forEach((vid, i) => names(i) = vid)
    new Verts(idx, names)
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

  def build(pairs: Array[(Long, Long)],
      extra: Array[Long] = Array.emptyLongArray): Graph = {
    val vs = intern(pairs, extra)
    val n = vs.n
    val deg = new Array[Int](n)
    pairs.foreach { case (u, _) => deg(vs.indexOf(u)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val adj = new Array[Int](pairs.length)
    pairs.foreach { case (u, v) =>
      val ui = vs.indexOf(u)
      adj(fill(ui)) = vs.indexOf(v)
      fill(ui) += 1
    }
    new Graph(vs, off, adj)
  }
}
