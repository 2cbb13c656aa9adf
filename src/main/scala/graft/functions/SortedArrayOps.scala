package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** Native codegen kernels over SORTED long arrays (the adjacency-array
  * representation the graph operators build with
  * `sort_array(collect_list(...))`). The composable spelling
  * `size(array_intersect(a, b))` is semantically right but pays, per
  * row, a hash-set build over one array, a probe per element of the
  * other, AND a materialized result array that the surrounding `size`
  * immediately discards. On the triangle count that row is an EDGE —
  * Θ(|E|) set builds and garbage arrays per pass. A two-pointer merge
  * walk over the already-sorted inputs does the same count with zero
  * allocation inside whole-stage codegen (the VectorOps discipline).
  */
object SortedArrayOps {

  /** |a ∩ b| for two ascending-sorted array<bigint> WITHOUT duplicates
    * or null elements (collect_list over distinct edges). Null array →
    * null, matching `size(array_intersect(...))`'s null propagation. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[Bridge.AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      val m = y.numElements()
      var i = 0
      var j = 0
      var c = 0L
      while (i < n && j < m) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { c += 1L; i += 1; j += 1 }
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = $x.numElements();
           |int $m = $y.numElements();
           |int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $n && $j < $m) {
           |  long $xv = $x.getLong($i);
           |  long $yv = $y.getLong($j);
           |  if ($xv < $yv) { $i++; }
           |  else if ($xv > $yv) { $j++; }
           |  else { $c++; $i++; $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))
}
