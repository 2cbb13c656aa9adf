package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** FNV-1a 64-bit over a string's UTF-8 bytes as a native Catalyst
  * expression WITH whole-stage codegen (`doGenCode`) — the hot-path form
  * of the reference's shard hash (blsenderwork.go:126-149). Unlike a
  * Scala UDF this stays inside the generated code: no boxing, no
  * serialization, full pipeline fusion.
  */
case class Fnv1aHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override def nullSafeEval(input: Any): Any =
    Fnv1aHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1aHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1aHash =
    copy(child = newChild)
}

/** FNV-1a 64 over a long's 8 little-endian bytes — the reference's
  * default shard key form (uint64 position via binary.Write LittleEndian,
  * blsenderwork.go:139-147), codegen'd like [[Fnv1aHash]]. */
case class Fnv1aHashLongLE(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64_long_le"

  override def nullSafeEval(input: Any): Any =
    Fnv1aHash.hashLongLE(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1aHash.hashLongLE($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1aHashLongLE =
    copy(child = newChild)
}

/** Murmur3's 64-bit finalizer (fmix64, public domain — Appleby's
  * MurmurHash3.cpp) over a long, codegen'd like [[Fnv1aHash]]. FNV-1a
  * alone is NOT uniform enough in its small-value tail for
  * order-statistic sketches: over short sequential key strings the
  * k-th minimum lands ~35% low, which the r10 SketchError ledger
  * measured as a 54% KMV overestimate (vs the 6.3% theoretical rsd at
  * k=256). Three xor-shift-multiply rounds restore full avalanche; the
  * DuckDB oracle twins reproduce the identical algebra in hi/lo 32-bit
  * HUGEINT arithmetic. */
case class Fmix64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fmix64"

  override def nullSafeEval(input: Any): Any =
    Fnv1aHash.fmix64Impl(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1aHash.fmix64Impl($c)")

  override protected def withNewChildInternal(newChild: Expression): Fmix64 =
    copy(child = newChild)
}

object Fnv1aHash {
  /** Static entry shared by interpreted eval and generated code. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a 64 over the value's 8 LE bytes (Go uint64 layout). */
  def hashLongLE(v: Long): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < 8) {
      h ^= ((v >>> (8 * i)) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** fmix64 (MurmurHash3 finalizer): full-avalanche bijection on the
    * 64-bit space — wraparound multiply is Java's native semantics. */
  def fmix64Impl(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def fnv1a64(c: Column): Column = Bridge.column(Fnv1aHash(Bridge.expression(c)))
  def fnv1a64LongLE(c: Column): Column = Bridge.column(Fnv1aHashLongLE(Bridge.expression(c)))
  def fmix64(c: Column): Column = Bridge.column(Fmix64(Bridge.expression(c)))
}
