package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant embedding direction by fixed-point power iteration — the
  * "what single axis explains this embedding table" diagnostic (top
  * singular direction of the quantized embedding matrix; the 1-D PCA a
  * pipeline runs to detect collapsed or degenerate embedding spaces).
  *
  * Numerics contract (cross-engine exact): embeddings quantize per
  * vector to int8-range integers (q64's proven algebra), the d×d GRAM
  * matrix accumulates as exact BIGINT sums, and each power-iteration
  * step is integer-only — w = M·v in BIGINT, then rescale
  * v' = sign(w)·(|w|·10⁶ div max|w|) with truncating division — so a
  * SQL twin unrolls the identical rounds in HUGEINT and hash-matches;
  * no float ever enters the loop (float matrix-vector sums are
  * order-dependent and would never cross engines).
  *
  * Scale shape: the Gram build is the distributed pass — one in-row
  * explode of (i, qi)×(j, qj) pairs into a (i, j) hash aggregation
  * (d²-cell output, embarrassingly partial-aggregable; at 100 TB the
  * map-side combine reduces each task to ≤ d² rows). The iteration
  * itself runs on the d×d result (4096 cells at d=64) — a
  * driver-local finish on a FIXED-SIZE aggregate, the BpeTrain gate
  * argument in its strongest form (the "collected" object never grows
  * with the data).
  */
object PowerIteration {

  /** q64's per-vector int8 quantization: floor(x · 127/max|x| + 0.5).
    * Zero vectors are dropped (no direction to contribute). */
  def quantized(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("__vd", transform(col(vecCol), x => x.cast("double")))
      .withColumn("__amax", array_max(transform(col("__vd"), x => abs(x))))
      .filter(col("__amax") > 0)
      .withColumn("q", transform(col("__vd"),
        x => floor(x * lit(127.0) / col("__amax") + 0.5).cast("long")))

  /** Exact-integer Gram matrix Σ q·qᵀ as (i, j, m) — 0-based indices.
    * (Measured dead end, r10: exploiting symmetry by slicing the upper
    * triangle — posexplode(slice(qv, i+1, d)) — halves the generated
    * rows but runs 1.4× SLOWER at sf0.1: the per-(row, i) slice
    * allocation costs more than the extra generator rows the plain
    * double explode streams through codegen. Full explode stays.) */
  def gram(emb: DataFrame, vecCol: String): DataFrame = {
    val q = quantized(emb, vecCol)
    q.select(col("q").as("__qv"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"), posexplode(col("__qv")).as(Seq("j", "qj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("qi") * col("qj")).as("m"))
  }

  /** @return (i, v_1e6): the dominant direction after `iters` integer
    *         power-iteration rounds from the all-ones start, components
    *         scaled so max|v| = 10⁶. */
  def dominantDirection(emb: DataFrame, vecCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1, 64]")
    val spark = emb.sparkSession
    val cells = gram(emb, vecCol).collect()
    require(cells.nonEmpty, "empty embedding table")
    val d = cells.iterator.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Long](d, d)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val scale = java.math.BigInteger.valueOf(1000000L)
    // Overflow guard (r10 review): |Σ m_ij·v_j| ≤ d · max|m| · 10⁶ —
    // Gram cells grow with the ROW COUNT (≤ 127²·rows), so past ~9 M
    // rows at d = 64 a Long accumulator would wrap while the HUGEINT
    // oracle stays exact. Big tables route through BigInteger
    // accumulation AND rescale (d² driver-side multiplies per round —
    // still free); small tables keep the primitive loop.
    val maxAbsM = m.iterator.flatMap(_.iterator).map(math.abs).max
    val bigPath = maxAbsM > 0 &&
      maxAbsM > Long.MaxValue / 1000000L / math.max(d, 1)
    var v = Array.fill(d)(1000000L)
    var it = 0
    while (it < iters) {
      // w in BigInteger on the big path (the sum itself can exceed
      // Long); rescale sign(w)·(|w|·1e6 div max|w|) is truncating on
      // magnitudes — the exact op the HUGEINT oracle reproduces
      val w: Array[java.math.BigInteger] =
        if (bigPath) {
          Array.tabulate(d) { i =>
            var acc = java.math.BigInteger.ZERO
            var j = 0
            while (j < d) {
              acc = acc.add(java.math.BigInteger.valueOf(m(i)(j))
                .multiply(java.math.BigInteger.valueOf(v(j))))
              j += 1
            }
            acc
          }
        } else {
          Array.tabulate(d) { i =>
            var acc = 0L
            var j = 0
            while (j < d) { acc += m(i)(j) * v(j); j += 1 }
            java.math.BigInteger.valueOf(acc)
          }
        }
      val amax = w.iterator.map(_.abs).reduce((a, b) => a.max(b))
      require(amax.signum > 0, "power iteration hit the zero vector")
      v = w.map { x =>
        val r = x.abs.multiply(scale).divide(amax).longValueExact()
        if (x.signum < 0) -r else r
      }
      it += 1
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toSeq.toDF("i", "v_1e6")
  }
}
