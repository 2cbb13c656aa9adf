package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.Bridge

/** Native codegen vector kernels for the similarity-search surface
  * (SURVEY.md B30 + north-star ANN). The composable formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically right but
  * executes as interpreted higher-order functions: one closure call and
  * one boxed Double per element, plus a materialized intermediate array
  * per pair. At 100 TB (billions of pairs x hundreds of dims) that is
  * the hot loop, so these are tight primitive loops inside whole-stage
  * codegen instead — same left-to-right fold order seeded at 0.0, so
  * results stay bit-identical to the HOF form and the DuckDB oracle
  * twins (`list_reduce(list_transform(...))`).
  *
  * Accepts array<float> or array<double> children; float elements are
  * widened exactly to double before multiplication, matching the
  * oracle's `CAST(x AS DOUBLE)`. Elements must be non-null (embedding
  * vectors); a null array yields null.
  */
object VectorOps {

  private def elemAccessor(t: DataType, arr: String, i: String): String =
    t match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  private def elemGet(t: DataType, arr: ArrayData, i: Int): Double =
    t match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** Dot product: fold-left sum of pairwise products (0.0 seed). */
  case class VectorDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vector_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += elemGet(left.dataType, x, i) * elemGet(right.dataType, y, i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${elemAccessor(left.dataType, x, i)} * ${elemAccessor(right.dataType, y, i)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VectorDot =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm: sqrt of fold-left sum of squares (0.0 seed). */
  case class VectorNormL2(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vector_norm_l2"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        val v = elemGet(child.dataType, x, i)
        s += v * v
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = ${elemAccessor(child.dataType, x, i)};
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): VectorNormL2 =
      copy(child = newChild)
  }

  def vectorDot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  def vectorNorm(a: Column): Column =
    Bridge.column(VectorNormL2(Bridge.expression(a)))
}
