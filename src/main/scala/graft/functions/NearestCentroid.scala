package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Dense centroid matrix with precomputed L2 norms — the broadcast
  * payload of [[NearestCentroid]]. Element widening (float → double)
  * happens once at build, exactly as the per-pair kernels widen, so the
  * per-row cosines are bit-identical to the crossJoin form. */
final class CentroidMatrix(val cids: Array[Long],
    val vecs: Array[Array[Double]], val norms: Array[Double])
    extends Serializable {
  def size: Int = cids.length
}

/** Exact nearest-centroid assignment as ONE native codegen expression:
  * per input vector, argmax over the broadcast centroid matrix of
  * cosine = dot(v,c) / (|v|·|c|), tie-broken to the smallest centroid
  * id — returns struct(cid, cos).
  *
  * This is the per-row form of the Similarity.assignToCentroids
  * crossJoin shape
  * (`base.crossJoin(broadcast(cents)).groupBy(id).agg(max(struct(cos,
  * -cid)))`), which pays, per input row: C generated join rows, C
  * struct allocations, C hash-aggregate probes, and — because the
  * composable cosine recomputes both norms per pair — 3× the necessary
  * flops. Here |v| is computed once per row, |c| once per centroid at
  * build, and the argmax runs in one tight loop with no intermediate
  * rows, no aggregation, and no exchange. The centroid side was ALREADY
  * a driver-collected broadcast in the crossJoin form, so the collect
  * this kernel needs moves no new bytes to the driver.
  *
  * Exactness (NearestCentroidSpec pins all of it against the crossJoin
  * form): dot and norm use the same left-to-right 0.0-seeded folds as
  * VectorOps (dot over min(len), norms over own lengths), the division
  * uses identical operands, and the comparison replicates Spark's SQL
  * double ordering — NaN greatest, NaN equal to NaN, ±0.0 equal — so
  * orthogonal ties assign identically. Null input array → null
  * (vectors are non-null by table contract, matching the VectorOps
  * kernels). One documented out-of-domain divergence: a ZERO-NORM
  * input makes the expansion's division PARTIAL (ANSI errors on the
  * zero divisor; non-ANSI yields NULL) while this kernel stays total
  * (NaN cosine, ranked greatest, ties to the smallest cid) — no
  * declared query reaches it (q108 filters zero-norm embeddings; the
  * vector fixtures are non-zero).
  */
case class NearestCentroid(child: Expression, bc: Broadcast[CentroidMatrix])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.best(input.asInstanceOf[ArrayData], bc.value, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", bc,
      classOf[Broadcast[CentroidMatrix]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroid.best($c, " +
        s"(graft.functions.CentroidMatrix) $bcRef.value(), $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Spark SQL double ordering: NaN greatest and equal to itself,
    * -0.0 == 0.0 (x < y / x > y are false on NaN operands, and false
    * between the two zeros, so both fall to the explicit branches). */
  private def cmp(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else {
      val xn = x != x
      val yn = y != y
      if (xn == yn) 0 else if (xn) 1 else -1
    }

  /** Static kernel shared by interpreted eval and generated code. The
    * input vector is widened into a primitive double[] ONCE per row
    * (exact float→double widening, same as the per-pair elemGet), so
    * the C dot loops run over plain arrays the JIT can vectorize
    * instead of per-element ArrayData accessor calls. */
  def best(v: ArrayData, m: CentroidMatrix, isFloat: Boolean): InternalRow = {
    val n = v.numElements()
    val vv = new Array[Double](n)
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) { val x = v.getFloat(i).toDouble; vv(i) = x; s += x * x; i += 1 }
    else while (i < n) { val x = v.getDouble(i); vv(i) = x; s += x * x; i += 1 }
    val nv = math.sqrt(s)
    var bestCid = 0L
    var bestCos = 0.0
    var k = 0
    while (k < m.size) {
      val c = m.vecs(k)
      val lim = math.min(n, c.length)
      var d = 0.0
      var j = 0
      while (j < lim) { d += vv(j) * c(j); j += 1 }
      val cos = d / (nv * m.norms(k))
      if (k == 0 || {
            val o = cmp(cos, bestCos)
            o > 0 || (o == 0 && m.cids(k) < bestCid)
          }) {
        bestCos = cos
        bestCid = m.cids(k)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestCos))
  }

  /** Collect a (cid, cv) centroid frame into a broadcast matrix. The
    * frame must be broadcast-sized — the same contract the crossJoin
    * form's `broadcast(centroids)` already imposed. Fails loudly on an
    * empty frame (argmax over nothing has no value; the crossJoin form
    * would silently emit zero rows — callers here always construct
    * non-empty seeds). */
  def broadcastCentroids(centroids: DataFrame): Broadcast[CentroidMatrix] = {
    val rows = centroids.select(
      org.apache.spark.sql.functions.col("cid").cast("long"),
      org.apache.spark.sql.functions.col("cv")).collect()
    require(rows.nonEmpty, "nearestCentroid: empty centroid frame")
    val cids = new Array[Long](rows.length)
    val vecs = new Array[Array[Double]](rows.length)
    val norms = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      cids(i) = rows(i).getLong(0)
      val seq = rows(i).getSeq[Any](1)
      val arr = new Array[Double](seq.length)
      var j = 0
      seq.foreach { x =>
        arr(j) = x match {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d
          case other => other.asInstanceOf[Number].doubleValue()
        }
        j += 1
      }
      vecs(i) = arr
      var sq = 0.0
      var k = 0
      while (k < arr.length) { sq += arr(k) * arr(k); k += 1 }
      norms(i) = math.sqrt(sq)
      i += 1
    }
    centroids.sparkSession.sparkContext.broadcast(
      new CentroidMatrix(cids, vecs, norms))
  }

  def nearestCentroid(vec: Column, bc: Broadcast[CentroidMatrix]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), bc))
}
