package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** All C(k,2) in-row pairs of a sorted BIGINT array, packed as ONE
  * BIGINT `a·2³² + b` per pair — the native codegen form of the basket
  * pair kernel (r12, q121). Replaces the HOF chain
  * `flatten(transform(ps, (x,i) -> transform(slice(ps, i+2, size(ps)),
  * y -> x·2³² + y)))`, which allocates a nested array per element and
  * evaluates two interpreted lambdas per pair: this is a tight
  * primitive double loop into one flat long[] (measured at the 10×
  * corpus: the HOF explode pass ran 1.37 s, the same pair stream from
  * this kernel ~3× faster), and it stays inside whole-stage codegen.
  *
  * Contract (identical to the HOF form's in-plan guard): every element
  * must lie in [0, 2³¹) — checked once per array on the SORTED array's
  * ends and thrown loudly from the task, never a silent corrupted key.
  * Unpack with `shiftright(pk, 32)` / `pk % 4294967296`.
  */
case class PackedPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_pairs"

  override def nullSafeEval(input: Any): Any =
    PackedPairs.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackedPairs.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): PackedPairs =
    copy(child = newChild)
}

object PackedPairs {

  /** Static kernel shared by interpreted eval and generated code. */
  def pack(ps: ArrayData): ArrayData = {
    val n = ps.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Long])
    if (ps.getLong(0) < 0L || ps.getLong(n - 1) >= 2147483648L)
      throw new IllegalArgumentException(
        s"packed_pairs: item id range [${ps.getLong(0)}, " +
          s"${ps.getLong(n - 1)}] outside [0, 2^31) — use the struct " +
          "pair form (CoOccur.pairsFromBaskets)")
    // C(k,2) must fit an int array; a 65k-item group is a fan-out bomb
    // the caller should have bounded long before this kernel
    require(n <= 65535,
      s"packed_pairs: group of $n items explodes to ${n.toLong * (n - 1) / 2} " +
        "pairs — bound or prune the group (CoOccur.pruneInfrequentItems)")
    // long math: n in (46340, 65535] overflows Int in n*(n-1); C(65535,2)
    // itself still fits an Int, so the toInt after the long divide is safe
    val m = (n.toLong * (n - 1) / 2).toInt
    val out = new Array[Long](m)
    var o = 0
    var i = 0
    while (i < n) {
      val x = ps.getLong(i) * 4294967296L
      var j = i + 1
      while (j < n) { out(o) = x + ps.getLong(j); o += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  def packedPairs(c: Column): Column =
    Bridge.column(PackedPairs(Bridge.expression(c)))
}
