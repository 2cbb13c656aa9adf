package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** All L-token window strings of a token array, chr(31)-joined, as ONE
  * native codegen expression — the hot-path form of ExactSpans' direct
  * window materialization (the q153 exact-repeat classes).
  *
  * Replaces the interpreted HOF chain
  * `transform(sequence(0, size(t) - L), i -> array_join(slice(t, i+1,
  * L), chr(31)))`: higher-order functions do not participate in
  * whole-stage codegen, so that spelling pays a per-window interpreted
  * lambda, a per-window slice allocation, and re-extracts each token's
  * bytes once per window it appears in (≈ L times). This kernel
  * extracts each token's bytes once per document and writes each
  * window's joined bytes in one pass — a tight loop inside codegen
  * (the TokenSpanHashes discipline).
  *
  * Contract: null-free token elements (callers pass `[a-z]+` regex
  * tokens from filter(split(...))). A doc shorter than L yields an
  * empty array — the `when(size >= L, ...)` guard the old chain needed
  * is built in. TokenWindowsSpec pins bit-equality against the HOF
  * chain including the short-doc guard.
  */
case class TokenWindowStrings(child: Expression, l: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(l >= 1, s"window length must be >= 1, got $l")

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_window_strings"

  override def nullSafeEval(input: Any): Any =
    TokenWindowStrings.windows(input.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenWindowStrings.windows($c, $l)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowStrings =
    copy(child = newChild)
}

object TokenWindowStrings {

  /** Static kernel shared by interpreted eval and generated code. */
  def windows(toks: ArrayData, l: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - l + 1
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    // each token's bytes extracted ONCE per doc (the HOF chain
    // re-extracted per covering window)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[AnyRef](m)
    var k = 0
    while (k < m) {
      var len = l - 1 // separators
      var j = k
      val lim = k + l
      while (j < lim) { len += tb(j).length; j += 1 }
      val b = new Array[Byte](len)
      var off = 0
      j = k
      while (j < lim) {
        if (j > k) { b(off) = 31; off += 1 }
        val t = tb(j)
        System.arraycopy(t, 0, b, off, t.length)
        off += t.length
        j += 1
      }
      out(k) = UTF8String.fromBytes(b)
      k += 1
    }
    new GenericArrayData(out)
  }

  def tokenWindowStrings(c: Column, l: Int): Column =
    Bridge.column(TokenWindowStrings(Bridge.expression(c), l))
}
