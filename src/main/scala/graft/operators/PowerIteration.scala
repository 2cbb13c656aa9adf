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
  * Scale shape: the Gram build is the distributed pass — ONE typed
  * Aggregator whose buffer is the flat d×d long array, rank-1-updated
  * per row inside each partition and merged across partitions
  * (r11 rewrite, replacing the r9 double-posexplode: the explode
  * materialized rows×d² generator rows — 20.5 M at sf0.1 — before the
  * map-side combine could shrink them; the Aggregator's fan-out is
  * partitions×d² by construction, the explode's asymptotic best case,
  * with zero per-pair row objects). The iteration itself runs on the
  * d×d result (4096 cells at d=64) — a driver-local finish on a
  * FIXED-SIZE aggregate, the BpeTrain gate argument in its strongest
  * form (the "collected" object never grows with the data).
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

  /** Typed Gram aggregator (B31 surface): buffer = the flat d×d long
    * array, lazily sized from the first vector, rank-1 updated per row
    * (`buf[i·d+j] += q_i·q_j`, zero rows of fan-out), merged
    * element-wise across partitions. Mixed-dimension inputs remap the
    * smaller buffer into the larger stride, matching the old explode
    * form's "shorter rows contribute their prefix" semantics.
    *
    * Input is the RAW double vector; the int8 quantization runs INSIDE
    * reduce with the identical IEEE algebra [[quantized]] spells as
    * columns (abs-max, floor(x·127/max + 0.5), zero vectors skipped) —
    * r11 follow-up: the column form paid three interpreted HOF passes
    * and a long-array encode per row before the aggregator ever saw
    * the data; fused, the only plan work is one native array<double>
    * cast (measured 0.51 → see BASELINE r11 tail refresh). */
  private[operators] object GramAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Double], Array[Long], Array[Long]] {
    private def dimOf(len: Int): Int = math.round(math.sqrt(len.toDouble)).toInt
    private def grow(buf: Array[Long], dOld: Int, dNew: Int): Array[Long] = {
      val nb = new Array[Long](dNew * dNew)
      var i = 0
      while (i < dOld) {
        System.arraycopy(buf, i * dOld, nb, i * dNew, dOld)
        i += 1
      }
      nb
    }
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b0: Array[Long], v: Seq[Double]): Array[Long] = {
      val va = v.toArray
      val d = va.length
      // q64's quantization, bit-equal to the [[quantized]] column form:
      // amax = max |x| (exact double), q_i = floor(x_i·127/amax + 0.5)
      var amax = 0.0
      var i = 0
      while (i < d) {
        val a = math.abs(va(i))
        // NaN parity with the column form (review fix): array_max
        // treats NaN as greatest, so ONE NaN poisons every division
        // and the whole vector contributes nothing — replicate that
        // (the JVM's `a > amax` would silently skip the NaN instead)
        if (a.isNaN) return b0
        if (a > amax) amax = a
        i += 1
      }
      if (amax <= 0.0) return b0 // zero vector: no direction, dropped
      val qa = new Array[Long](d)
      i = 0
      while (i < d) {
        qa(i) = math.floor(va(i) * 127.0 / amax + 0.5).toLong
        i += 1
      }
      var buf = b0
      var stride = dimOf(buf.length)
      if (d > stride) { buf = grow(buf, stride, d); stride = d }
      i = 0
      while (i < d) {
        val qi = qa(i)
        if (qi != 0L) {
          val off = i * stride
          var j = 0
          while (j < d) { buf(off + j) += qi * qa(j); j += 1 }
        }
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.length == 0) return y
      if (y.length == 0) return x
      val (big, small) =
        if (x.length >= y.length) (x, y)
        else (y, x)
      val target =
        if (small.length == big.length) big
        else {
          val db = dimOf(big.length)
          // fold the smaller matrix into the bigger stride
          val ds = dimOf(small.length)
          val nb = big
          var i = 0
          while (i < ds) {
            var j = 0
            while (j < ds) { nb(i * db + j) += small(i * ds + j); j += 1 }
            i += 1
          }
          return nb
        }
      var k = 0
      while (k < small.length) { target(k) += small(k); k += 1 }
      target
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Flat row-major d×d Gram matrix Σ q·qᵀ — one Aggregator pass over
    * the raw vectors (quantization fused into reduce, one native cast
    * in the plan), partitions×d² merge traffic. Empty input → empty
    * array. */
  def gramFlat(emb: DataFrame, vecCol: String): Array[Long] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull)
      .as[Seq[Double]]
      .select(GramAgg.toColumn.name("cells"))
      .head()
  }

  /** Exact-integer Gram matrix Σ q·qᵀ as (i, j, m) — 0-based indices,
    * dense d² rows (the r9 explode form's exact output, now derived
    * from [[gramFlat]]'s single aggregate).
    * (Measured dead end, r10: exploiting symmetry by slicing the upper
    * triangle — posexplode(slice(qv, i+1, d)) — halves the generated
    * rows but runs 1.4× SLOWER at sf0.1 than the double explode; both
    * are superseded by the Aggregator, which generates no rows at all.) */
  def gram(emb: DataFrame, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val flat = gramFlat(emb, vecCol)
    val d = math.round(math.sqrt(flat.length.toDouble)).toInt
    (0 until d).flatMap(i => (0 until d).map(j => (i, j, flat(i * d + j))))
      .toDF("i", "j", "m")
  }

  /** @return (i, v_1e6): the dominant direction after `iters` integer
    *         power-iteration rounds from the all-ones start, components
    *         scaled so max|v| = 10⁶. */
  def dominantDirection(emb: DataFrame, vecCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1, 64]")
    val spark = emb.sparkSession
    val flat = gramFlat(emb, vecCol)
    require(flat.nonEmpty, "empty embedding table")
    val d = math.round(math.sqrt(flat.length.toDouble)).toInt
    val m = Array.tabulate(d, d)((i, j) => flat(i * d + j))
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
