package graft.cdc.source

import java.nio.charset.StandardCharsets

/** Decoder for MySQL's binary JSON storage format (the `JSON` column
  * type's in-binlog representation, type code 245) — public format, per
  * the server's json_binary documentation: a one-byte type tag followed
  * by the value; objects/arrays are offset-indexed so readers can seek,
  * with small (16-bit) and large (32-bit) header variants; small scalars
  * are inlined into the offset slot.
  *
  * Output is the JSON text string the rest of the pipeline already
  * consumes (the feed's schema-less pass-through contract): object keys
  * in stored order, strings escaped exactly like the template engine's
  * toJson so rendered payloads are byte-stable end to end.
  *
  * The reference gets this decode from go-mysql (SURVEY §1.2 passes JSON
  * columns through as strings); this is the from-scratch equivalent.
  */
object BinlogJson {

  // type tags (public format)
  private val SmallObject = 0x00
  private val LargeObject = 0x01
  private val SmallArray = 0x02
  private val LargeArray = 0x03
  private val Literal = 0x04
  private val Int16 = 0x05
  private val UInt16 = 0x06
  private val Int32 = 0x07
  private val UInt32 = 0x08
  private val Int64 = 0x09
  private val UInt64 = 0x0a
  private val DoubleT = 0x0b
  private val StringT = 0x0c

  /** Whole-document decode: [type byte, value bytes] → JSON text.
    * An empty payload is MySQL's representation of a JSON `null`. */
  def decode(bytes: Array[Byte]): String =
    if (bytes.isEmpty) "null"
    else render(bytes, bytes(0) & 0xff, 1)

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def i64(b: Array[Byte], p: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  /** Render the value of type `tpe` whose body starts at `p`. For
    * containers, `p` is the address offsets are relative to. */
  private def render(b: Array[Byte], tpe: Int, p: Int): String = tpe match {
    case Literal => (b(p) & 0xff) match {
      case 0x00 => "null"
      case 0x01 => "true"
      case 0x02 => "false"
      case other => throw new IllegalArgumentException(s"bad JSON literal $other")
    }
    case Int16 => u16(b, p).toShort.toString
    case UInt16 => u16(b, p).toString
    case Int32 => u32(b, p).toInt.toString
    case UInt32 => u32(b, p).toString
    case Int64 => i64(b, p).toString
    case UInt64 => java.lang.Long.toUnsignedString(i64(b, p))
    case DoubleT => fmtDouble(java.lang.Double.longBitsToDouble(i64(b, p)))
    case StringT =>
      // variable-length length: 7 bits per byte, high bit = continuation
      var len = 0L; var shift = 0; var q = p
      var cont = true
      while (cont) {
        val byte = b(q) & 0xff
        len |= (byte & 0x7fL) << shift
        shift += 7; q += 1
        cont = (byte & 0x80) != 0
      }
      escape(new String(b, q, len.toInt, StandardCharsets.UTF_8))
    case SmallObject | LargeObject | SmallArray | LargeArray =>
      val large = tpe == LargeObject || tpe == LargeArray
      val isObj = tpe == SmallObject || tpe == LargeObject
      val osz = if (large) 4 else 2 // offset/count field width
      def cnt(at: Int): Long = if (large) u32(b, at) else u16(b, at).toLong
      val count = cnt(p).toInt
      // header: count, total-size, then key entries (objects), value entries
      var q = p + 2 * osz
      val keys: Array[String] =
        if (!isObj) null
        else {
          val ks = new Array[String](count)
          var i = 0
          while (i < count) {
            val keyOff = cnt(q).toInt
            val keyLen = u16(b, q + osz) // key length is always 16-bit
            ks(i) = escape(new String(b, p + keyOff, keyLen, StandardCharsets.UTF_8))
            q += osz + 2
            i += 1
          }
          ks
        }
      val sb = new java.lang.StringBuilder
      sb.append(if (isObj) '{' else '[')
      var i = 0
      while (i < count) {
        if (i > 0) sb.append(',')
        if (isObj) { sb.append(keys(i)); sb.append(':') }
        val vType = b(q) & 0xff
        // small scalars are inlined in the offset slot; everything else
        // is addressed relative to the container start
        val inlined = vType match {
          case Literal | Int16 | UInt16 => true
          case Int32 | UInt32 => large
          case _ => false
        }
        sb.append(
          if (inlined) render(b, vType, q + 1)
          else render(b, vType, p + cnt(q + 1).toInt))
        q += 1 + osz
        i += 1
      }
      sb.append(if (isObj) '}' else ']')
      sb.toString
    case other =>
      throw new IllegalArgumentException(s"unsupported JSON binary type 0x${other.toHexString}")
  }

  /** Deterministic double rendering, matching BinlogBinary's float
    * pass-through (integral values print as integers). */
  private def fmtDouble(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** JSON string escaping — byte-identical to TemplateEngine.toJson's
    * string case so template-rendered payloads round-trip. (Shared with
    * [[BinlogJsonDiff]] so partially-updated documents escape the same.) */
  private[source] def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case ch if ch < 0x20 => sb.append(f"\\u${ch.toInt}%04x")
      case ch => sb.append(ch)
    }
    sb.append('"')
    sb.toString
  }
}
