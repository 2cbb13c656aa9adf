package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** Hilbert-curve index of a 2-D point as ONE native codegen expression
  * — the locality-stronger sibling of [[ZValue]] (Morton): consecutive
  * Hilbert indices are always GRID-ADJACENT cells (unit steps, no
  * Morton "seam jumps"), so range scans over Hilbert-sorted files touch
  * strictly fewer distant regions — the layout choice for 2-D range
  * workloads (Hilbert 1891; the standard xy2d bit recursion).
  *
  * Kernel: per bit level s = n/2 … 1, quadrant = (3·rx) xor ry,
  * d += s²·quadrant, then the canonical reflect+swap rotation
  * (`rot` with the FULL grid size n — the Wikipedia formulation, which
  * the generated SQL twin [[HilbertValue.hilbertSql]] unrolls level by
  * level so the DuckDB oracle reproduces every value exactly).
  */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbertvalue"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertValue.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.HilbertValue.xy2d($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {

  /** Static kernel shared by interpreted eval and generated code:
    * canonical xy2d over the 2^bits × 2^bits grid. Coordinates must be
    * in [0, 2^bits). */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertValue(
      Bridge.expression(x), Bridge.expression(y), bits))

  /** Portable SQL twin: the xy2d loop unrolled as a CTE chain, one
    * level per CTE (keeps the expression tree linear — inlining 8
    * rotation levels into one scalar expression would blow up 3^8).
    * `h0` must provide (passthrough cols, hx, hy, hd=0); the result of
    * level `bits` is `h$bits` with the final Hilbert index in `hd`.
    * @param passthrough comma-terminated column list carried through
    *                    every level verbatim (e.g. `"ox, oy, "`) */
  def hilbertCtes(bits: Int, passthrough: String): String = {
    val n = 1L << bits
    (0 until bits).map { k =>
      val s = 1L << (bits - 1 - k)
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h${k + 1} AS (SELECT $passthrough
         |  CASE WHEN $ry = 0 THEN
         |    CASE WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END
         |  ELSE hx END AS hx,
         |  CASE WHEN $ry = 0 THEN
         |    CASE WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END
         |  ELSE hy END AS hy,
         |  hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |FROM h$k)""".stripMargin
    }.mkString(",\n")
  }
}
