package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Epoch-nanos → canonical `yyyy-MM-dd HH:mm:ss` UTC string as ONE
  * native codegen expression (guide §4.1 / the SortedArrayOps
  * discipline) — the hot-path form of `Canon.nsToStr`, which renders a
  * timestamp string per OUTPUT ROW in q10/q21/q26/q27/q29.
  *
  * The composable spelling
  * `date_format(timestamp_micros(ns div 1000), "yyyy-MM-dd HH:mm:ss")`
  * pays, per row: an Instant/LocalDateTime object chain inside Spark's
  * TimestampFormatter, a java.lang.String render, and a UTF8String
  * re-encode. This kernel computes the civil date with pure integer
  * arithmetic (Howard Hinnant's days-to-civil algorithm, public domain)
  * and writes the 19 ASCII bytes directly.
  *
  * Exactness domain = ALL int64 nanos: |ns| ≤ 2⁶³ ≈ ±292 years around
  * 1970, so the civil year is always in [1677, 2262] — four positive
  * digits, no year-of-era/width edge cases by construction.
  * NsToStrSpec pins bit-equality against the composable chain across
  * the full domain (extremes, both signs, sub-second floors, leap
  * days). UTC-only by contract: the whole driver surface (bench,
  * Verify, oracle) runs spark.sql.session.timeZone=UTC; the chain it
  * replaces renders in session time, so this kernel must only be wired
  * where that contract holds (Canon.nsToStr).
  */
case class NsToStrUtc(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "ns_to_str_utc"

  override def nullSafeEval(input: Any): Any =
    NsToStrUtc.format(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NsToStrUtc.format($c)")

  override protected def withNewChildInternal(newChild: Expression): NsToStrUtc =
    copy(child = newChild)
}

object NsToStrUtc {

  /** Static entry shared by interpreted eval and generated code.
    * Semantics replicated exactly from the composable chain:
    * micros = ns div 1000 (IntegralDivide = truncate toward zero),
    * then the rendered second is floor(micros / 1e6) — date_format
    * prints the wall-clock second the instant falls in. */
  def format(ns: Long): UTF8String = {
    val micros = ns / 1000L
    val secs = Math.floorDiv(micros, 1000000L)
    val days = Math.floorDiv(secs, 86400L)
    val sod = Math.floorMod(secs, 86400L).toInt
    // civil-from-days; year ∈ [1677, 2262] for any int64 ns (scaladoc)
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = (z - era * 146097L).toInt
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val y = (yoe + era * 400 + (if (m <= 2) 1 else 0)).toInt
    val hh = sod / 3600
    val mi = (sod / 60) % 60
    val ss = sod % 60
    val b = new Array[Byte](19)
    b(0) = ('0' + y / 1000).toByte
    b(1) = ('0' + (y / 100) % 10).toByte
    b(2) = ('0' + (y / 10) % 10).toByte
    b(3) = ('0' + y % 10).toByte
    b(4) = '-'
    b(5) = ('0' + m / 10).toByte
    b(6) = ('0' + m % 10).toByte
    b(7) = '-'
    b(8) = ('0' + d / 10).toByte
    b(9) = ('0' + d % 10).toByte
    b(10) = ' '
    b(11) = ('0' + hh / 10).toByte
    b(12) = ('0' + hh % 10).toByte
    b(13) = ':'
    b(14) = ('0' + mi / 10).toByte
    b(15) = ('0' + mi % 10).toByte
    b(16) = ':'
    b(17) = ('0' + ss / 10).toByte
    b(18) = ('0' + ss % 10).toByte
    UTF8String.fromBytes(b)
  }

  def nsToStrUtc(c: Column): Column = Bridge.column(NsToStrUtc(Bridge.expression(c)))
}
