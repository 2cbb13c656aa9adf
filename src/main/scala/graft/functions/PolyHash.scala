package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Portable polynomial string hash fold((h·31 + byte) mod 1e9+7) as a
  * native Catalyst expression with whole-stage codegen — the hot-path
  * form of the dedup identity hash (TextDedup.strHash). The interpreted
  * HOF formulation (`aggregate(transform(split(s, "")...))`) invokes a
  * lambda per character; this is a tight primitive loop over the
  * UTF8String's bytes.
  *
  * ASCII-only contract: byte-folding equals the per-character ascii()
  * fold ONLY for 7-bit input. Callers hash `[a-z]+` regex tokens, which
  * guarantees it; for arbitrary strings use the HOF form. The DuckDB
  * twin (`list_reduce` over `ascii(w[i])`) matches bit-for-bit on the
  * same input domain. */
case class StrPolyHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "str_poly_hash"

  override def nullSafeEval(input: Any): Any =
    StrPolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StrPolyHash =
    copy(child = newChild)
}

object StrPolyHash {
  private final val P = 1000000007L

  /** Static entry shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xffL)) % P
      i += 1
    }
    h
  }

  def strPolyHash(c: Column): Column = Bridge.column(StrPolyHash(Bridge.expression(c)))
}
