package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Distinct rolling w-token span hashes of a token-string array as ONE
  * native codegen expression — the hot-path form of the dedup shingle /
  * span kernel (TextDedup.shingleHashes / spanHashes). Per token t:
  * th = fold (h·31 + byte) mod 1e9+7 over t's bytes (≡ [[StrPolyHash]],
  * ASCII-only contract — callers pass `[a-z]+` regex tokens); per
  * window of w consecutive tokens: fold (a·8191 + th) mod 1e9+7 from 0;
  * output = first-occurrence-distinct spans.
  *
  * Replaces the interpreted HOF chain
  * `array_distinct(transform(sequence(...), i -> aggregate(slice(th,
  * i+1, w), 0L, (a,x) -> (a·8191+x) % P)))`, which evaluates a lambda
  * per window element (O(n·w) interpreted calls per row) — this is a
  * tight primitive loop with an open-addressing dedup table, and it
  * stays inside whole-stage codegen. Bit-identical to the HOF form and
  * to the DuckDB oracle twin on the shared input domain.
  */
case class TokenSpanHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, s"span width must be >= 1, got $w")

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_span_hashes"

  override def nullSafeEval(input: Any): Any =
    TokenSpanHashes.distinctSpans(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenSpanHashes.distinctSpans($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): TokenSpanHashes =
    copy(child = newChild)
}

object TokenSpanHashes {
  private final val P = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def distinctSpans(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    // per-token polynomial byte hashes
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var j = 0
      while (j < bytes.length) {
        h = (h * 31L + (bytes(j) & 0xffL)) % P
        j += 1
      }
      th(i) = h
      i += 1
    }
    // rolling span folds + first-occurrence dedup (open addressing;
    // 0 marks an empty slot, the hash value 0 is tracked separately)
    val out = new Array[Long](m)
    var outN = 0
    var cap = Integer.highestOneBit(math.max(4, m * 2 - 1)) << 1
    var table = new Array[Long](cap)
    var seenZero = false
    var k = 0
    while (k < m) {
      var h = 0L
      var j = k
      val lim = k + w
      while (j < lim) {
        h = (h * 8191L + th(j)) % P
        j += 1
      }
      // insert if unseen
      if (h == 0L) {
        if (!seenZero) { seenZero = true; out(outN) = 0L; outN += 1 }
      } else {
        var idx = (java.lang.Long.hashCode(h * 0x9e3779b97f4a7c15L)) & (cap - 1)
        var found = false
        while (!found && table(idx) != 0L) {
          if (table(idx) == h) found = true
          else idx = (idx + 1) & (cap - 1)
        }
        if (!found) {
          table(idx) = h
          out(outN) = h
          outN += 1
        }
      }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  def tokenSpanHashes(c: Column, w: Int): Column =
    Bridge.column(TokenSpanHashes(Bridge.expression(c), w))
}

/** POSITIONAL rolling w-token span hashes: one hash per window start, in
  * token order (output index k = span over tokens [k, k+w)), with NO
  * dedup — the occurrence-level form that exact-substring removal (q91)
  * needs, where every position of a repeated span matters, not just its
  * first appearance. Same per-token byte fold and per-window 8191 fold
  * as [[TokenSpanHashes]] (bit-identical hash values, ASCII-only token
  * contract), same tight primitive loop inside whole-stage codegen.
  */
case class TokenSpanHashesAll(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, s"span width must be >= 1, got $w")

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_span_hashes_all"

  override def nullSafeEval(input: Any): Any =
    TokenSpanHashesAll.allSpans(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenSpanHashesAll.allSpans($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): TokenSpanHashesAll =
    copy(child = newChild)
}

object TokenSpanHashesAll {
  private final val P = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def allSpans(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var j = 0
      while (j < bytes.length) {
        h = (h * 31L + (bytes(j) & 0xffL)) % P
        j += 1
      }
      th(i) = h
      i += 1
    }
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      var h = 0L
      var j = k
      val lim = k + w
      while (j < lim) {
        h = (h * 8191L + th(j)) % P
        j += 1
      }
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }

  def tokenSpanHashesAll(c: Column, w: Int): Column =
    Bridge.column(TokenSpanHashesAll(Bridge.expression(c), w))
}
