package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** Morton (z-order) interleave of the low `bits` bits of two
  * non-negative longs as ONE native codegen expression — the kernel of
  * the Z-order layout operator ([[graft.operators.ZOrder]]): bit i of
  * `left` lands at result bit 2i, bit i of `right` at 2i+1. A single
  * tight loop in generated code replaces the 3·bits-term mask-shift-add
  * unroll (identical values; ZOrder.zValueSql stays the portable SQL
  * twin the DuckDB oracle runs). */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZValue.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZValue.interleave($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Static kernel shared by interpreted eval and generated code. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def zvalue(x: Column, y: Column, bits: Int): Column =
    Bridge.column(ZValue(Bridge.expression(x), Bridge.expression(y), bits))
}
