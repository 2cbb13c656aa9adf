package graft.cdc

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.util.zip.CRC32

import graft.SparkTestBase
import graft.cdc.source.{BinlogBinary, BinlogFileFeed}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Independent ENCODER of the public MySQL binlog v4 binary format, used
  * to generate fixture files in-test: common header, FORMAT_DESCRIPTION
  * (with the 5.6.1+ checksum-algorithm byte and always-present FDE
  * checksum field), TABLE_MAP (+ the MySQL 8 COLUMN_NAME optional
  * metadata TLV, binlog_row_metadata=FULL), and ROWS v2 bodies with
  * interleaved before/after UPDATE images — each laid out from the format
  * documentation, not from the decoder under test. */
object BinlogFixture {

  /** After-image marker for a JSON column arriving as a diff sequence
    * (PARTIAL_JSON). ops: (0 replace | 1 insert | 2 remove, path, value). */
  final case class Partial(diffs: Seq[(Int, String, BinlogFixture.JsonDoc)])

  case class Col(name: String, tpe: Int, meta: Int = 0)

  /** Independent encoder of MySQL's binary JSON format (small object /
    * array variants) — laid out from the public format description, not
    * from the decoder under test. Offsets are relative to the container
    * body start; literal/int16/uint16 inline into the offset slot. */
  sealed trait JsonDoc {
    def tpe: Int
    def body: Array[Byte]
    final def bytes: Array[Byte] = tpe.toByte +: body
  }
  object JsonDoc {
    private def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    case object JNull extends JsonDoc { val tpe = 0x04; val body = Array(0x00.toByte) }
    case class JBool(b: Boolean) extends JsonDoc {
      val tpe = 0x04; val body = Array((if (b) 0x01 else 0x02).toByte)
    }
    case class JI16(v: Short) extends JsonDoc { val tpe = 0x05; val body = le(v.toLong, 2) }
    case class JI32(v: Int) extends JsonDoc { val tpe = 0x07; val body = le(v.toLong, 4) }
    case class JI64(v: Long) extends JsonDoc { val tpe = 0x09; val body = le(v, 8) }
    case class JU64(v: Long) extends JsonDoc { val tpe = 0x0a; val body = le(v, 8) }
    case class JD(v: Double) extends JsonDoc {
      val tpe = 0x0b; val body = le(java.lang.Double.doubleToLongBits(v), 8)
    }
    case class JS(s: String) extends JsonDoc {
      val tpe = 0x0c
      val body = {
        val b = s.getBytes("UTF-8")
        require(b.length < 128, "fixture strings use the 1-byte varlen form")
        b.length.toByte +: b
      }
    }
    private def inlined(v: JsonDoc): Boolean = v.tpe == 0x04 || v.tpe == 0x05 || v.tpe == 0x06
    private def container(isObj: Boolean, keys: Seq[String], vals: Seq[JsonDoc]): Array[Byte] = {
      val n = vals.size
      val keyBytes = keys.map(_.getBytes("UTF-8"))
      val header = 4 + (if (isObj) 4 * n else 0) + 3 * n
      val keysStart = header
      var off = keysStart + keyBytes.map(_.length).sum
      val valueEntries = vals.map { v =>
        if (inlined(v)) {
          val slot = v.body.padTo(2, 0.toByte)
          (v.tpe, (slot(0) & 0xff) | ((slot(1) & 0xff) << 8), Array.empty[Byte])
        } else { val o = off; off += v.body.length; (v.tpe, o, v.body) }
      }
      val size = off
      val out = new ByteArrayOutputStream()
      def w(b: Array[Byte]): Unit = out.write(b, 0, b.length)
      w(le(n.toLong, 2)); w(le(size.toLong, 2))
      if (isObj) {
        var ko = keysStart
        keyBytes.foreach { kb => w(le(ko.toLong, 2)); w(le(kb.length.toLong, 2)); ko += kb.length }
      }
      valueEntries.foreach { case (t, slot, _) => out.write(t); w(le(slot.toLong, 2)) }
      keyBytes.foreach(w)
      valueEntries.foreach { case (_, _, b) => w(b) }
      out.toByteArray
    }
    case class JArr(items: JsonDoc*) extends JsonDoc {
      val tpe = 0x02; val body = container(isObj = false, Seq.empty, items)
    }
    case class JObj(fields: (String, JsonDoc)*) extends JsonDoc {
      val tpe = 0x00; val body = container(isObj = true, fields.map(_._1), fields.map(_._2))
    }
  }

  final class Builder(checksum: Boolean, serverVersion: String = "8.0.32") {
    private val out = new ByteArrayOutputStream()
    out.write(Array(0xfe, 'b', 'i', 'n').map(_.toByte), 0, 4)
    private var pos = 4L

    private def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    private def lenenc(v: Long): Array[Byte] =
      if (v < 251) Array(v.toByte)
      else if (v < 65536) 0xfc.toByte +: le(v, 2)
      else if (v < (1L << 24)) 0xfd.toByte +: le(v, 3)
      else 0xfe.toByte +: le(v, 8)
    private def be(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte).toArray

    /** Append one event: 19-byte v4 header, body, optional CRC32. */
    def event(evType: Int, body: Array[Byte]): Long = {
      val size = 19 + body.length + (if (checksum) 4 else 0)
      pos += size
      val header = le(1700000000L, 4) ++ Array(evType.toByte) ++ le(1L, 4) ++
        le(size.toLong, 4) ++ le(pos, 4) ++ le(0L, 2)
      out.write(header, 0, header.length)
      out.write(body, 0, body.length)
      if (checksum) {
        val crc = new CRC32()
        crc.update(header); crc.update(body)
        out.write(le(crc.getValue, 4), 0, 4)
      }
      pos
    }

    /** FORMAT_DESCRIPTION: binlog version 4, 50-byte server version,
      * header length, per-type post-header lengths, checksum-alg byte.
      * When the algorithm is NONE the FDE still carries its (zeroed)
      * 4-byte checksum field — the alg byte sits at len-5 either way. */
    def fde(): this.type = {
      val ver = serverVersion.getBytes("UTF-8").padTo(50, 0.toByte)
      val body = le(4L, 2) ++ ver ++ le(0L, 4) ++ Array(19.toByte) ++
        Array.fill(39)(0.toByte) ++ Array((if (checksum) 1 else 0).toByte) ++
        (if (checksum) Array.empty[Byte] else Array.fill(4)(0.toByte))
      event(BinlogBinary.FORMAT_DESCRIPTION_EVENT, body)
      this
    }

    private def metaBytes(c: Col): Array[Byte] = c.tpe match {
      case BinlogBinary.T_FLOAT | BinlogBinary.T_DOUBLE |
          BinlogBinary.T_BLOB | BinlogBinary.T_DATETIME2 |
          BinlogBinary.T_TIMESTAMP2 | BinlogBinary.T_TIME2 |
          BinlogBinary.T_JSON | BinlogBinary.T_GEOMETRY => Array(c.meta.toByte)
      case BinlogBinary.T_VARCHAR | BinlogBinary.T_NEWDECIMAL |
          BinlogBinary.T_BIT => le(c.meta.toLong, 2)
      case BinlogBinary.T_STRING => le(c.meta.toLong, 2) // [b0, b1] raw
      case _ => Array.empty
    }

    def tableMap(tableId: Long, schema: String, table: String,
        cols: Seq[Col], withNames: Boolean = true): this.type = {
      val meta = cols.flatMap(metaBytes).toArray
      val names =
        if (!withNames) Array.empty[Byte]
        else {
          val nameBytes = cols.flatMap { c =>
            val b = c.name.getBytes("UTF-8"); lenenc(b.length.toLong) ++ b
          }.toArray
          Array(4.toByte) ++ lenenc(nameBytes.length.toLong) ++ nameBytes
        }
      val s = schema.getBytes("UTF-8"); val t = table.getBytes("UTF-8")
      val body = le(tableId, 6) ++ le(1L, 2) ++
        Array(s.length.toByte) ++ s ++ Array(0.toByte) ++
        Array(t.length.toByte) ++ t ++ Array(0.toByte) ++
        lenenc(cols.size.toLong) ++ cols.map(_.tpe.toByte).toArray ++
        lenenc(meta.length.toLong) ++ meta ++
        Array.fill((cols.size + 7) / 8)(0.toByte) ++ names
      event(BinlogBinary.TABLE_MAP_EVENT, body)
      this
    }

    private def value(c: Col, v: Any): Array[Byte] = (c.tpe, v) match {
      case (BinlogBinary.T_TINY, i: Int) => Array(i.toByte)
      case (BinlogBinary.T_SHORT, i: Int) => le(i.toLong & 0xffff, 2)
      case (BinlogBinary.T_INT24, i: Int) => le(i.toLong & 0xffffff, 3)
      case (BinlogBinary.T_LONG, i: Int) => le(i.toLong & 0xffffffffL, 4)
      case (BinlogBinary.T_LONGLONG, l: Long) => le(l, 8)
      case (BinlogBinary.T_YEAR, y: Int) => Array((y - 1900).toByte)
      case (BinlogBinary.T_DOUBLE, d: Double) =>
        le(java.lang.Double.doubleToLongBits(d), 8)
      case (BinlogBinary.T_FLOAT, f: Float) =>
        le(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL, 4)
      case (BinlogBinary.T_VARCHAR, s: String) =>
        val b = s.getBytes("UTF-8")
        (if (c.meta > 255) le(b.length.toLong, 2) else Array(b.length.toByte)) ++ b
      case (BinlogBinary.T_STRING, v: Any) =>
        // metadata byte0 selects the real type: 247 ENUM (index, pack
        // length in byte1), 248 SET (byte1-byte LE bitmask), else CHAR
        // (high capacity bits folded into byte0's 0x30 slot)
        (c.meta & 0xff, v) match {
          case (247, i: Int) =>
            if ((c.meta >> 8) == 1) Array(i.toByte) else le(i.toLong, 2)
          case (248, l: Long) => le(l, c.meta >> 8)
          case (b0, s: String) =>
            // b0 == 254 exactly ⇔ capacity ≤ 255 ⇔ 1-byte value prefix
            val b = s.getBytes("UTF-8")
            (if (b0 != 254) le(b.length.toLong, 2) else Array(b.length.toByte)) ++ b
        }
      case (BinlogBinary.T_BLOB, s: String) =>
        val b = s.getBytes("UTF-8"); le(b.length.toLong, c.meta) ++ b
      case (BinlogBinary.T_DATETIME2, s: String) =>
        // "YYYY-MM-DD HH:MM:SS[.micros]" → 5-byte big-endian pack + frac
        val sign = 1L
        val (dt, frac) = s.span(_ != '.')
        val Array(d0, t0) = dt.split(' ')
        val Array(y, mo, dd) = d0.split('-').map(_.toInt)
        val Array(hh, mi, ss) = t0.split(':').map(_.toInt)
        val packed = (sign << 39) | ((y * 13L + mo) << 22) | (dd.toLong << 17) |
          (hh.toLong << 12) | (mi.toLong << 6) | ss.toLong
        val fspBytes = (c.meta + 1) / 2
        val fval = if (frac.isEmpty) 0L
          else frac.drop(1).padTo(6, '0').take(2 * fspBytes).toLong
        be(packed, 5) ++ (if (fspBytes > 0) be(fval, fspBytes) else Array.empty[Byte])
      case (BinlogBinary.T_DATE, s: String) =>
        val Array(y, m, d) = s.split('-').map(_.toInt)
        le((y.toLong << 9) | (m.toLong << 5) | d.toLong, 3)
      case (BinlogBinary.T_TIMESTAMP2, s: String) =>
        // "epochSeconds[.micros]" — 4 BE bytes + datetime2-style fraction
        val (sec, frac) = s.span(_ != '.')
        val fspBytes = (c.meta + 1) / 2
        val fval = if (frac.isEmpty) 0L
          else frac.drop(1).padTo(6, '0').take(2 * fspBytes).toLong
        be(sec.toLong, 4) ++ (if (fspBytes > 0) be(fval, fspBytes) else Array.empty[Byte])
      case (BinlogBinary.T_TIME2, s: String) =>
        // "[-]HH:MM:SS[.micros]" with meta = fsp
        val neg = s.startsWith("-")
        val (hms0, frac) = s.stripPrefix("-").span(_ != '.')
        val Array(hh, mi, ss) = hms0.split(':').map(_.toInt)
        val hms = (hh.toLong << 12) | (mi.toLong << 6) | ss.toLong
        val micros = if (frac.isEmpty) 0L else frac.drop(1).padTo(6, '0').toLong
        val fspBytes = (c.meta + 1) / 2
        fspBytes match {
          case 0 =>
            be((if (neg) -hms else hms) + 0x800000L, 3)
          case 3 =>
            val tmp = (hms << 24) | micros
            be((if (neg) -tmp else tmp) + 0x800000000000L, 6)
          case n => // 1 or 2 frac bytes, units of 10^4 / 10^2 micros
            val unit = if (n == 1) 10000L else 100L
            val units = micros / unit
            require(micros % unit == 0, s"fixture time fraction $micros not encodable at fsp ${c.meta}")
            if (!neg) be(hms + 0x800000L, 3) ++ be(units, n)
            else if (units == 0) be(0x800000L - hms, 3) ++ be(0L, n)
            else be(0x800000L - hms - 1, 3) ++ be((1L << (8 * n)) - units, n)
        }
      case (BinlogBinary.T_BIT, l: Long) =>
        val nbits = ((c.meta >> 8) & 0xff) * 8 + (c.meta & 0xff)
        be(l, (nbits + 7) / 8)
      case (BinlogBinary.T_NEWDECIMAL, s: String) =>
        encodeDecimal(s, c.meta & 0xff, (c.meta >> 8) & 0xff)
      case (BinlogBinary.T_JSON, doc: JsonDoc) =>
        val b = doc.bytes
        le(b.length.toLong, c.meta) ++ b
      case (BinlogBinary.T_GEOMETRY, b: Array[Byte]) =>
        le(b.length.toLong, c.meta) ++ b
      case other => throw new IllegalArgumentException(s"fixture can't encode $other")
    }

    /** Independent NEWDECIMAL encoder: base-10^9 big-endian groups with
      * short head/tail groups, MSB of byte 0 flipped, whole buffer
      * complemented when negative — laid out from the format docs. */
    private def encodeDecimal(s: String, precision: Int, scale: Int): Array[Byte] = {
      val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
      val neg = s.startsWith("-")
      val (ip0, fp0) = s.stripPrefix("-").span(_ != '.')
      val intg = precision - scale
      val ip = (("0" * intg) + ip0).takeRight(intg)
      val fp = (fp0.drop(1) + "0" * scale).take(scale)
      val out = java.nio.ByteBuffer.allocate(
        (intg / 9) * 4 + dig2bytes(intg % 9) + (scale / 9) * 4 + dig2bytes(scale % 9))
      def put(digits: String): Unit = if (digits.nonEmpty) {
        val v = digits.toLong
        (0 until dig2bytes(digits.length)).reverse
          .foreach(i => out.put(((v >>> (8 * i)) & 0xff).toByte))
      }
      put(ip.take(intg % 9))
      ip.drop(intg % 9).grouped(9).foreach(put)
      fp.take(scale / 9 * 9).grouped(9).foreach(put)
      put(fp.drop(scale / 9 * 9))
      val raw = out.array()
      raw(0) = (raw(0) ^ 0x80).toByte
      if (neg) raw.indices.foreach(i => raw(i) = (~raw(i)).toByte)
      raw
    }

    /** ROWS v2 body: images is the FLAT image list (for UPDATE pass
      * before1, after1, before2, after2, …, exactly as MySQL writes). */
    def rows(evType: Int, tableId: Long, cols: Seq[Col],
        images: Seq[Seq[Any]]): this.type = {
      val n = cols.size
      val present = Array.fill((n + 7) / 8)(0.toByte)
      (0 until n).foreach(i => present(i / 8) = (present(i / 8) | (1 << (i % 8))).toByte)
      val isUpdate = evType == BinlogBinary.UPDATE_ROWS_V2
      val imgBytes = images.flatMap { img =>
        val nullBm = Array.fill((n + 7) / 8)(0.toByte)
        img.zipWithIndex.foreach { case (v, i) =>
          if (v == null) nullBm(i / 8) = (nullBm(i / 8) | (1 << (i % 8))).toByte
        }
        nullBm.toSeq ++ img.zipWithIndex.flatMap { case (v, i) =>
          if (v == null) Array.empty[Byte] else value(cols(i), v)
        }
      }.toArray
      val body = le(tableId, 6) ++ le(1L, 2) ++ le(2L, 2) ++ // v2: extra len = 2 (empty)
        lenenc(n.toLong) ++ present ++ (if (isUpdate) present else Array.empty[Byte]) ++
        imgBytes
      event(evType, body)
      this
    }

    def rotate(nextFile: String, nextPos: Long): this.type = {
      event(BinlogBinary.ROTATE_EVENT, le(nextPos, 8) ++ nextFile.getBytes("UTF-8"))
      this
    }

    /** One partial-JSON diff: REPLACE(0)/INSERT(1) with a binary-JSON
      * value, REMOVE(2) with value = null. */
    def diffBytes(diffs: Seq[(Int, String, JsonDoc)]): Array[Byte] =
      diffs.flatMap { case (op, path, value) =>
        val pb = path.getBytes("UTF-8")
        val head = Array(op.toByte) ++ lenenc(pb.length.toLong) ++ pb
        if (op == 2) head
        else {
          val vb = value.bytes
          head ++ lenenc(vb.length.toLong) ++ vb
        }
      }.toArray

    /** PARTIAL_UPDATE_ROWS_EVENT (type 39, WL#2955): like a v2 UPDATE,
      * but each after image carries a lenenc value-options field + a
      * partial-bits bitmap (one bit per JSON column in the image), and
      * JSON columns whose bit is set hold a diff sequence in the usual
      * length framing. In `images`, an after-image JSON cell may be a
      * `Partial(diffs)` — encoded as diffs — or a plain JsonDoc (full
      * value, bit clear). */
    def partialRows(tableId: Long, cols: Seq[Col],
        images: Seq[Seq[Any]]): this.type = {
      val n = cols.size
      val present = Array.fill((n + 7) / 8)(0.toByte)
      (0 until n).foreach(i => present(i / 8) = (present(i / 8) | (1 << (i % 8))).toByte)
      val jsonCols = cols.indices.filter(i => cols(i).tpe == BinlogBinary.T_JSON)
      val imgBytes = images.zipWithIndex.flatMap { case (img, idx) =>
        val isAfter = idx % 2 == 1
        val prefix: Array[Byte] =
          if (!isAfter) Array.empty
          else {
            val bits = Array.fill((jsonCols.size + 7) / 8)(0.toByte)
            jsonCols.zipWithIndex.foreach { case (ci, j) =>
              if (img(ci).isInstanceOf[Partial])
                bits(j / 8) = (bits(j / 8) | (1 << (j % 8))).toByte
            }
            lenenc(1L) ++ bits // value_options bit 0 = PARTIAL_JSON
          }
        val nullBm = Array.fill((n + 7) / 8)(0.toByte)
        img.zipWithIndex.foreach { case (v, i) =>
          if (v == null) nullBm(i / 8) = (nullBm(i / 8) | (1 << (i % 8))).toByte
        }
        prefix.toSeq ++ nullBm.toSeq ++ img.zipWithIndex.flatMap { case (v, i) =>
          v match {
            case null => Array.empty[Byte]
            case Partial(diffs) =>
              val d = diffBytes(diffs)
              le(d.length.toLong, cols(i).meta) ++ d
            case other => value(cols(i), other)
          }
        }
      }.toArray
      val body = le(tableId, 6) ++ le(1L, 2) ++ le(2L, 2) ++
        lenenc(n.toLong) ++ present ++ present ++ imgBytes
      event(BinlogBinary.PARTIAL_UPDATE_ROWS_EVENT, body)
      this
    }

    /** TRANSACTION_PAYLOAD (type 40): wraps the events built by `build`
      * (run against a fresh inner Builder; its magic + any checksums are
      * not part of a payload — inner events are always checksum-free) in
      * the lenenc-TLV field block + payload layout, zstd-compressed when
      * `compress`. Field order mirrors MySQL's writer: compression type,
      * uncompressed size (compressed only), payload size, end mark. */
    def txnPayload(compress: Boolean)(build: Builder => Unit): this.type = {
      val inner = new Builder(checksum = false)
      build(inner)
      val raw = inner.bytes.drop(4) // strip magic: a payload is a bare event stream
      val payload =
        if (compress) com.github.luben.zstd.Zstd.compress(raw)
        else raw
      def field(t: Long, v: Long): Array[Byte] = {
        val enc = lenenc(v)
        lenenc(t) ++ lenenc(enc.length.toLong) ++ enc
      }
      val body =
        field(2, if (compress) 0L else 255L) ++
          (if (compress) field(3, raw.length.toLong) else Array.empty[Byte]) ++
          field(1, payload.length.toLong) ++
          lenenc(0L) ++ payload
      event(BinlogBinary.TRANSACTION_PAYLOAD_EVENT, body)
      this
    }

    /** Raw TRANSACTION_PAYLOAD with caller-supplied field block + payload
      * (malformed-input tests). */
    def txnPayloadRaw(fieldsAndPayload: Array[Byte]): this.type = {
      event(BinlogBinary.TRANSACTION_PAYLOAD_EVENT, fieldsAndPayload)
      this
    }

    def bytes: Array[Byte] = out.toByteArray
    def lastPos: Long = pos
  }
}

/** The real-binary-format half of A1: fixture binlog bytes decoded
  * through the UNCHANGED offset/decode/route/template pipeline. */
class BinlogBinarySpec extends SparkTestBase {
  import BinlogFixture._
  import BinlogBinary._

  private val userCols = Seq(
    Col("id", T_LONG), Col("name", T_VARCHAR, 255), Col("score", T_DOUBLE, 8),
    Col("bio", T_BLOB, 2), Col("joined", T_DATETIME2, 0))

  private def standardFile(checksum: Boolean): Array[Byte] =
    new Builder(checksum).fde()
      .tableMap(23L, "testdb", "users", userCols)
      .rows(WRITE_ROWS_V2, 23L, userCols, Seq(
        Seq(42, "ada", 3.5, "first bio", "2024-03-05 12:34:56"),
        Seq(-7, "bob", -0.25, null, "1999-12-31 23:59:59")))
      .rows(UPDATE_ROWS_V2, 23L, userCols, Seq(
        Seq(42, "ada", 3.5, "first bio", "2024-03-05 12:34:56"),   // before
        Seq(42, "ada lovelace", 4.0, "updated bio", "2024-03-05 12:34:56"))) // after
      .rows(DELETE_ROWS_V2, 23L, userCols, Seq(
        Seq(-7, "bob", -0.25, null, "1999-12-31 23:59:59")))
      .rotate("mysql-bin.000002", 4L)
      .bytes

  test("decodes WRITE/UPDATE/DELETE_ROWS v2 + ROTATE from real binlog bytes") {
    for (checksum <- Seq(false, true)) {
      val evs = BinlogBinary.decodeFile(standardFile(checksum), "mysql-bin.000001")
      assert(evs.map(_.eventType) == Vector("WriteRowsEventV2",
        "UpdateRowsEventV2", "DeleteRowsEventV2", "RotateEvent"))
      val w = evs(0)
      assert(w.database == "testdb" && w.table == "users")
      assert(w.colNames.toSeq == Seq("id", "name", "score", "bio", "joined"))
      assert(w.rows.length == 2)
      assert(w.rows(0).toSeq == Seq("42", "ada", "3.5", "first bio",
        "2024-03-05 12:34:56"))
      // signed two's complement, null bitmap, negative double
      assert(w.rows(1).toSeq == Seq("-7", "bob", "-0.25", null,
        "1999-12-31 23:59:59"))
      // UPDATE: interleaved (before, after) images, after-image intact
      val u = evs(1)
      assert(u.rows.length == 2)
      assert(u.rows(0).toSeq == Seq("42", "ada", "3.5", "first bio",
        "2024-03-05 12:34:56"))
      assert(u.rows(1).toSeq == Seq("42", "ada lovelace", "4", "updated bio",
        "2024-03-05 12:34:56"))
      // rotate carries next file/position (A18 bookkeeping)
      val r = evs(3)
      assert(r.binlogFile == "mysql-bin.000002" && r.binlogPosition == 4L)
      // rows events are addressed by header.logPos, strictly increasing
      val positions = evs.take(3).map(_.binlogPosition)
      assert(positions == positions.sorted && positions.distinct == positions)
    }
  }

  test("NEWDECIMAL/DATE/TIME2/TIMESTAMP2/BIT decode (go-mysql type parity)") {
    val cols = Seq(
      Col("price", T_NEWDECIMAL, 10 | (2 << 8)),      // DECIMAL(10,2)
      Col("tiny_frac", T_NEWDECIMAL, 4 | (4 << 8)),   // DECIMAL(4,4)
      Col("huge", T_NEWDECIMAL, 30 | (10 << 8)),      // DECIMAL(30,10)
      Col("whole", T_NEWDECIMAL, 9 | (0 << 8)),       // DECIMAL(9,0)
      Col("d", T_DATE),
      Col("t0", T_TIME2, 0), Col("t2", T_TIME2, 2), Col("t6", T_TIME2, 6),
      Col("ts", T_TIMESTAMP2, 0), Col("ts3", T_TIMESTAMP2, 3),
      Col("flags", T_BIT, 4 | (0 << 8)),              // BIT(4)
      Col("wide", T_BIT, 1 | (5 << 8)))               // BIT(41)
    val rows = Seq(
      Seq("12345678.90", "0.1234", "12345678901234567890.0000012345", "42",
        "2024-02-29", "13:45:09", "23:59:58.99", "00:00:01.000001",
        "1700000000", "1700000000.123",
        11L, (1L << 40) | 123L),
      Seq("-12345678.90", "-0.1234", "-12345678901234567890.0000012345", "-42",
        "1999-12-31", "-13:45:09", "-00:00:01.50", "-838:59:58.999999",
        "0", "86400.5",
        0L, 0L))
    val b = new Builder(true).fde()
      .tableMap(41L, "testdb", "typed", cols)
      .rows(WRITE_ROWS_V2, 41L, cols, rows)
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs.length == 1)
    assert(evs(0).rows(0).toSeq == Seq(
      "12345678.90", "0.1234", "12345678901234567890.0000012345", "42",
      "2024-02-29", "13:45:09", "23:59:58.99", "00:00:01.000001",
      "2023-11-14 22:13:20", "2023-11-14 22:13:20.123",
      "11", ((1L << 40) | 123L).toString))
    assert(evs(0).rows(1).toSeq == Seq(
      "-12345678.90", "-0.1234", "-12345678901234567890.0000012345", "-42",
      "1999-12-31", "-13:45:09", "-00:00:01.50", "-838:59:58.999999",
      "1970-01-01 00:00:00", "1970-01-02 00:00:00.500",
      "0", "0"))
  }

  test("ENUM/SET/CHAR>255 decode through the STRING real-type packing") {
    // metadata helpers laid out from the format docs, independent of the
    // decoder: CHAR folds capacity bits 8-9 into the type byte's 0x30
    // slot; ENUM/SET record the real type in byte0, pack size in byte1
    def charMeta(len: Int): Int =
      (T_STRING ^ (((len >> 8) & 0x3) << 4)) | ((len & 0xff) << 8)
    val cols = Seq(
      Col("status", T_STRING, T_ENUM | (1 << 8)),   // ENUM, 1-byte index
      Col("status2", T_STRING, T_ENUM | (2 << 8)),  // ENUM, 2-byte index
      Col("flags", T_STRING, T_SET | (2 << 8)),     // SET of ≤16 members
      Col("code", T_STRING, charMeta(20)),          // CHAR(20), 1-byte prefix
      Col("wide", T_STRING, charMeta(600)))         // CHAR capacity 600
    val longStr = "x" * 300
    val b = new Builder(true).fde()
      .tableMap(51L, "testdb", "enums", cols)
      .rows(WRITE_ROWS_V2, 51L, cols, Seq(
        Seq(3, 300, 0x8001L, "ok", longStr)))
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs(0).rows(0).toSeq ==
      Seq("3", "300", "32769", "ok", longStr))
  }

  test("GEOMETRY columns decode to hex WKB (binary-safe pass-through)") {
    val cols = Seq(Col("id", T_LONG), Col("geo", T_GEOMETRY, 4))
    // SRID 0 + WKB for POINT(1 2), little-endian
    val wkb = Array[Int](0, 0, 0, 0, 0x01, 0x01, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0xf0, 0x3f, 0, 0, 0, 0, 0, 0, 0, 0x40).map(_.toByte)
    val b = new Builder(true).fde()
      .tableMap(61L, "testdb", "places", cols)
      .rows(WRITE_ROWS_V2, 61L, cols, Seq(Seq(1, wkb)))
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs(0).rows(0)(1) == wkb.map(x => f"${x & 0xff}%02x").mkString)
  }

  test("binary JSON columns decode to JSON text (T=245)") {
    import JsonDoc._
    val doc = JObj(
      "a" -> JI16(7),
      "arr" -> JArr(JBool(true), JNull, JS("x\ny"), JI64(3000000000L), JD(2.5)),
      "nested" -> JObj("k" -> JS("v"), "n" -> JI16(-5)),
      "big" -> JU64(-1L), // 2^64 - 1
      "s" -> JS("plain"))
    val cols = Seq(Col("id", T_LONG), Col("payload", T_JSON, 4))
    val b = new Builder(true).fde()
      .tableMap(42L, "testdb", "docs", cols)
      .rows(WRITE_ROWS_V2, 42L, cols, Seq(
        Seq(1, doc), Seq(2, JArr(JI16(1), JI16(2))), Seq(3, JS("top")),
        Seq(4, JI32(-100000)), Seq(5, null)))
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    val vals = evs(0).rows.map(_(1)).toSeq
    assert(vals(0) ==
      """{"a":7,"arr":[true,null,"x\ny",3000000000,2.5],"nested":{"k":"v","n":-5},"big":18446744073709551615,"s":"plain"}""")
    assert(vals(1) == "[1,2]")
    assert(vals(2) == "\"top\"")
    assert(vals(3) == "-100000")
    assert(vals(4) == null)
    // round-trips through the template engine's JSON path byte-stable
    assert(TemplateEngine.toJson("x\ny") == "\"x\\ny\"")
  }

  test("CRC32 trailers are verified, not skipped") {
    val good = standardFile(true)
    assert(BinlogBinary.decodeFile(good, "f").nonEmpty)
    // flip one payload byte in the middle of the file: decode must fail
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x01).toByte
    val e = intercept[Exception](BinlogBinary.decodeFile(bad, "f"))
    assert(e.getMessage.contains("CRC32") || e.getMessage.contains("mismatch"))
  }

  test("rows for a TABLE_MAP without COLUMN_NAME metadata are skipped (ref parity)") {
    val b = new Builder(false).fde()
      .tableMap(9L, "testdb", "anon", Seq(Col("x", T_LONG)), withNames = false)
      .rows(WRITE_ROWS_V2, 9L, Seq(Col("x", T_LONG)), Seq(Seq(1)))
      .rotate("next", 4L)
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs.map(_.eventType) == Vector("RotateEvent"))
  }

  test("rows event for an unmapped table id fails loudly") {
    val b = new Builder(false).fde()
      .rows(WRITE_ROWS_V2, 77L, Seq(Col("x", T_LONG)), Seq(Seq(1)))
    val e = intercept[IllegalArgumentException](BinlogBinary.decodeFile(b.bytes, "f"))
    assert(e.getMessage.contains("unmapped table id 77"))
  }

  test("GTID/XID/QUERY events are skipped like the reference's default case") {
    // a GTID_LOG_EVENT (type 33, mysql) and a mariadb GTID (type 162)
    // between the row events: the decode loop must pass over them (the
    // reference's `default: continue`, blreaderwork.go:308-311), not die
    val b = new Builder(true)
    b.fde().tableMap(5L, "testdb", "users", Seq(Col("id", T_LONG)))
    // hand-rolled opaque events through the same framing
    b.event(33, Array.fill[Byte](25)(0x42)) // GTID: flags + SID + GNO
    b.event(162, Array.fill[Byte](13)(0x17)) // mariadb GTID
    b.event(16, Array.fill[Byte](8)(0x01)) // XID
    b.rows(WRITE_ROWS_V2, 5L, Seq(Col("id", T_LONG)), Seq(Seq(9)))
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs.map(_.eventType) == Vector("WriteRowsEventV2"))
    assert(evs.head.rows(0).toSeq == Seq("9"))
  }

  test("checksum-awareness follows the server version") {
    assert(BinlogBinary.versionAtLeast561("8.0.32"))
    assert(BinlogBinary.versionAtLeast561("5.6.1-log"))
    assert(!BinlogBinary.versionAtLeast561("5.5.62"))
    assert(!BinlogBinary.versionAtLeast561("5.6.0"))
    assert(BinlogBinary.versionAtLeast561("10.11.6-MariaDB"))
  }

  test("malformed bytes never escape as raw index errors (fuzz)") {
    val good = standardFile(false) // no CRC: corruption must be caught structurally
    val rnd = new scala.util.Random(42)
    var decoded = 0
    for (i <- 1 to 300) {
      val mutated = rnd.nextInt(3) match {
        case 0 => good.take(4 + rnd.nextInt(good.length - 4)) // truncation
        case 1 => // byte flip
          val b = good.clone(); val p = 4 + rnd.nextInt(b.length - 4)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte; b
        case 2 => // random garbage after the magic
          BinlogBinary.Magic ++ Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      }
      try { BinlogBinary.decodeFile(mutated, "fuzz"); decoded += 1 }
      catch {
        case _: IllegalArgumentException => // the ONE allowed failure mode
        case e: Throwable => fail(s"iteration $i leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // some mutations decode (flips in string payloads etc.) — both
    // outcomes are fine; what's pinned is the absence of raw errors
    assert(decoded >= 0)
  }

  test("BinlogFileFeed tails a growing file incrementally, torn tail waits") {
    val dir = Files.createTempDirectory("binfeed-grow")
    val full = standardFile(true)
    val feed = new BinlogFileFeed(dir.toString)
    val seg = "mysql-bin.000001.binlog"
    // write a prefix ending mid-event (torn tail): decode must serve the
    // complete prefix events without error
    Files.write(dir.resolve(seg), full.take(full.length - 7))
    val n1 = feed.extent(seg)
    assert(n1 >= 1 && n1 < 4, s"prefix should yield a strict subset, got $n1")
    // append the rest: ONLY the new bytes decode (resumable decoder) and
    // the tail events appear in order
    Files.write(dir.resolve(seg), full)
    assert(feed.extent(seg) == 4L)
    val r = feed.open(seg, 0L, 4L)
    val got = Iterator.continually(if (r.next()) Some(r.get()) else None)
      .takeWhile(_.isDefined).flatten.toVector
    assert(got.map(_.eventType) == Vector("WriteRowsEventV2",
      "UpdateRowsEventV2", "DeleteRowsEventV2", "RotateEvent"))
  }

  test("BinlogFileFeed: segments, extent, slice reads") {
    val dir = Files.createTempDirectory("binfeed")
    Files.write(dir.resolve("mysql-bin.000001.binlog"), standardFile(true))
    val feed = new BinlogFileFeed(dir.toString)
    assert(feed.segments() == Seq("mysql-bin.000001.binlog"))
    assert(feed.extent("mysql-bin.000001.binlog") == 4L)
    val r = feed.open("mysql-bin.000001.binlog", 1L, 3L)
    val got = Iterator.continually(if (r.next()) Some(r.get()) else None)
      .takeWhile(_.isDefined).flatten.toVector
    assert(got.map(_.eventType) == Vector("UpdateRowsEventV2", "DeleteRowsEventV2"))
  }

  test("BinlogFileFeed decode cache is bounded by events; evicted segments re-decode") {
    val dir = Files.createTempDirectory("binfeed-evict")
    val bytes = standardFile(true) // 4 feed events per segment
    (1 to 12).foreach(i => Files.write(dir.resolve(f"mysql-bin.$i%06d.binlog"), bytes))
    val prev = graft.cdc.source.BinlogFileFeed.maxCachedEvents
    graft.cdc.source.BinlogFileFeed.maxCachedEvents = 16L // = 4 segments
    try {
      val feed = new BinlogFileFeed(dir.toString)
      feed.segments().foreach(s => assert(feed.extent(s) == 4L))
      assert(graft.cdc.source.BinlogFileFeed.cachedEvents <= 16L)
      assert(graft.cdc.source.BinlogFileFeed.cachedSegments < 12)
      // the first segment was evicted — reading it again re-decodes fully
      val r = feed.open("mysql-bin.000001.binlog", 0L, 4L)
      val got = Iterator.continually(if (r.next()) Some(r.get()) else None)
        .takeWhile(_.isDefined).flatten.toVector
      assert(got.map(_.eventType) == Vector("WriteRowsEventV2",
        "UpdateRowsEventV2", "DeleteRowsEventV2", "RotateEvent"))
    } finally graft.cdc.source.BinlogFileFeed.maxCachedEvents = prev
  }

  test("binary feed drives the unchanged decode pipeline: after-image-only UPDATE") {
    val dir = Files.createTempDirectory("binfeed2")
    Files.write(dir.resolve("mysql-bin.000001.binlog"), standardFile(true))
    val raw = spark.read.format("binlog-replay")
      .option("path", dir.toString).option("format", "binlog").load()
    val envelope = Decode.decode(raw, Map("testdb" -> Seq("users")))
    val items = envelope.orderBy(col("log.binlogPosition"), col("itemID"))
      .collect()
    // write(2 rows) + update(after image ONLY) + delete(1 row) = 4 items
    assert(items.length == 4)
    def data(r: org.apache.spark.sql.Row) =
      r.getStruct(r.fieldIndex("data"))
    val ops = items.map(r => data(r).getAs[String]("operation")).toSeq
    assert(ops == Seq("INSERT", "INSERT", "UPDATE", "DELETE"))
    val d = data(items(2))
    val updRows = d.getSeq[scala.collection.Map[String, String]](d.fieldIndex("rows"))
    assert(updRows.length == 1)
    // after-image values only — the before image never reaches the sink
    assert(updRows.head("name") == "ada lovelace")
    assert(updRows.head("score") == "4")
  }

  test("decoded binary events render the reference example template payload") {
    val dir = Files.createTempDirectory("binfeed3")
    Files.write(dir.resolve("mysql-bin.000001.binlog"), standardFile(true))
    val raw = spark.read.format("binlog-replay")
      .option("path", dir.toString).option("format", "binlog").load()
    val envelope = Decode.decode(raw, Map("testdb" -> Seq("users")))
    val route = Route("users", "collector", Seq("INSERT", "UPDATE", "DELETE"),
      "testdb.users",
      """{"id":"{{ (index .Data.Rows 0).id }}","name":"{{ (index .Data.Rows 0).name }}","op":"{{ .Data.Operation }}"}""")
    val rendered = Routing.outbound(envelope, route)
      .orderBy(col("log.binlogPosition"))
      .select(col("payload")).collect().map(_.getString(0)).toSeq
    assert(rendered.size == 4)
    // the UPDATE payload carries the AFTER image (blreaderwork.go:261-263)
    assert(rendered(2) ==
      """{"id":"42","name":"ada lovelace","op":"UPDATE"}""")
    assert(rendered(3) == """{"id":"-7","name":"bob","op":"DELETE"}""")
  }

  test("streaming read of binary binlog through checkpointed micro-batches") {
    val dir = Files.createTempDirectory("binfeed4")
    Files.write(dir.resolve("mysql-bin.000001.binlog"), standardFile(true))
    CollectingConnector.clear()
    val conns: Map[String, Connector] = Map("collector" -> new CollectingConnector("bb1"))
    val route = Route("users", "collector", Seq("INSERT", "UPDATE", "DELETE"),
      "testdb.users", """{{ .Data.Operation }}:{{ (index .Data.Rows 0).id }}""")
    val raw = spark.readStream.format("binlog-replay")
      .option("path", dir.toString).option("format", "binlog")
      .option("maxEventsPerTrigger", "2").load()
    val q = Decode.decode(raw, Map("testdb" -> Seq("users"))).writeStream
      .foreachBatch(Connectors.forEachBatch(Seq(route), conns))
      .option("checkpointLocation", Files.createTempDirectory("ckptbb").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = CollectingConnector.drain("bb1").map(_._2).sorted
    assert(got == Seq("DELETE:-7", "INSERT:-7", "INSERT:42", "UPDATE:42"))
  }

  /** One compressed (or raw) transaction: TABLE_MAP inside the payload
    * (as MySQL writes it), then WRITE + UPDATE + DELETE. */
  private def txnFile(compress: Boolean, checksum: Boolean = true): Array[Byte] =
    new Builder(checksum).fde()
      .txnPayload(compress) { inner =>
        inner.tableMap(23L, "testdb", "users", userCols)
          .rows(WRITE_ROWS_V2, 23L, userCols, Seq(
            Seq(42, "ada", 3.5, "first bio", "2024-03-05 12:34:56"),
            Seq(-7, "bob", -0.25, null, "1999-12-31 23:59:59")))
          .rows(UPDATE_ROWS_V2, 23L, userCols, Seq(
            Seq(42, "ada", 3.5, "first bio", "2024-03-05 12:34:56"),
            Seq(42, "ada lovelace", 4.0, "updated bio", "2024-03-05 12:34:56")))
          .rows(DELETE_ROWS_V2, 23L, userCols, Seq(
            Seq(-7, "bob", -0.25, null, "1999-12-31 23:59:59")))
        ()
      }
      .bytes

  test("TRANSACTION_PAYLOAD: compressed and raw transactions decode (MySQL >= 8.0.20)") {
    for (compress <- Seq(true, false); checksum <- Seq(true, false)) {
      val evs = BinlogBinary.decodeFile(txnFile(compress, checksum), "mysql-bin.000001")
      assert(evs.map(_.eventType) == Vector("WriteRowsEventV2",
        "UpdateRowsEventV2", "DeleteRowsEventV2"))
      assert(evs(0).colNames.toSeq == Seq("id", "name", "score", "bio", "joined"))
      assert(evs(0).rows(0).toSeq == Seq("42", "ada", "3.5", "first bio",
        "2024-03-05 12:34:56"))
      assert(evs(1).rows(1).toSeq == Seq("42", "ada lovelace", "4", "updated bio",
        "2024-03-05 12:34:56"))
      // every inner event is addressed by the OUTER payload event's end
      // position — the transaction's only resumable offset
      assert(evs.map(_.binlogPosition).distinct.length == 1)
    }
  }

  test("TRANSACTION_PAYLOAD: a TABLE_MAP from before the payload serves inner rows") {
    val b = new Builder(true).fde()
      .tableMap(23L, "testdb", "users", userCols)
      .txnPayload(compress = true) { inner =>
        inner.rows(WRITE_ROWS_V2, 23L, userCols, Seq(
          Seq(1, "eve", 1.0, "b", "2024-01-01 00:00:00")))
        ()
      }
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs.length == 1 && evs(0).rows(0)(1) == "eve")
  }

  test("TRANSACTION_PAYLOAD: compressed transaction drives decode->route->sink e2e") {
    val dir = Files.createTempDirectory("binfeed-txn")
    Files.write(dir.resolve("mysql-bin.000001.binlog"), txnFile(compress = true))
    CollectingConnector.clear()
    val conns: Map[String, Connector] = Map("collector" -> new CollectingConnector("txn1"))
    val route = Route("users", "collector", Seq("INSERT", "UPDATE", "DELETE"),
      "testdb.users", """{{ .Data.Operation }}:{{ (index .Data.Rows 0).id }}:{{ (index .Data.Rows 0).name }}""")
    val raw = spark.readStream.format("binlog-replay")
      .option("path", dir.toString).option("format", "binlog").load()
    val q = Decode.decode(raw, Map("testdb" -> Seq("users"))).writeStream
      .foreachBatch(Connectors.forEachBatch(Seq(route), conns))
      .option("checkpointLocation", Files.createTempDirectory("ckpttxn").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = CollectingConnector.drain("txn1").map(_._2).sorted
    assert(got == Seq("DELETE:-7:bob", "INSERT:-7:bob", "INSERT:42:ada",
      "UPDATE:42:ada lovelace"))
  }

  test("TRANSACTION_PAYLOAD: malformed payloads fail loudly, never wrong-decode") {
    def lenenc(v: Long): Array[Byte] =
      if (v < 251) Array(v.toByte)
      else { assert(v < 65536); Array(0xfc.toByte, (v & 0xff).toByte, ((v >> 8) & 0xff).toByte) }
    // unknown compression type 7
    val badComp = new Builder(false).fde()
      .txnPayloadRaw(Array[Byte](2, 1, 7, 0) ++ Array[Byte](1, 2, 3))
    val e1 = intercept[IllegalArgumentException] {
      BinlogBinary.decodeFile(badComp.bytes, "f")
    }
    assert(e1.getMessage.contains("compression type 7"))
    // zstd payload that is not zstd (garbage bytes)
    val garbage = Array.tabulate[Byte](32)(i => (i * 37).toByte)
    val badZstd = new Builder(false).fde()
      .txnPayloadRaw(Array[Byte](2, 1, 0) ++ // compression = ZSTD
        Array[Byte](3, 1, 64) ++             // uncompressed size = 64
        Array[Byte](0) ++ garbage)
    val e2 = intercept[IllegalArgumentException] {
      BinlogBinary.decodeFile(badZstd.bytes, "f")
    }
    assert(e2.getMessage.contains("zstd"))
    // payload-size field disagreeing with the actual remaining bytes
    // (compression NONE = 255 needs the 0xfc two-byte lenenc form)
    val noneEnc = Array[Byte](0xfc.toByte, 0xff.toByte, 0x00)
    val badSize = new Builder(false).fde()
      .txnPayloadRaw(Array[Byte](2, 3) ++ noneEnc ++
        Array[Byte](1, 1, 99) ++ Array[Byte](0) ++ Array[Byte](1, 2, 3))
    val e3 = intercept[IllegalArgumentException] {
      BinlogBinary.decodeFile(badSize.bytes, "f")
    }
    assert(e3.getMessage.contains("payload size"))
    // truncated inner event stream (raw payload cut mid-event)
    val whole = new Builder(false)
    whole.txnPayload(compress = false) { inner =>
      inner.tableMap(23L, "testdb", "users", userCols)
        .rows(WRITE_ROWS_V2, 23L, userCols, Seq(
          Seq(1, "a", 1.0, "b", "2024-01-01 00:00:00")))
      ()
    }
    // rebuild the payload with its last 3 bytes cut, keeping fields valid
    val innerB = new Builder(false)
    innerB.tableMap(23L, "testdb", "users", userCols)
      .rows(WRITE_ROWS_V2, 23L, userCols, Seq(
        Seq(1, "a", 1.0, "b", "2024-01-01 00:00:00")))
    val cut = innerB.bytes.drop(4).dropRight(3)
    val sizeEnc = lenenc(cut.length.toLong)
    val torn = new Builder(false).fde()
      .txnPayloadRaw(Array[Byte](2, 3) ++ noneEnc ++
        Array[Byte](1, sizeEnc.length.toByte) ++ sizeEnc ++ Array[Byte](0) ++ cut)
    val e4 = intercept[IllegalArgumentException] {
      BinlogBinary.decodeFile(torn.bytes, "f")
    }
    assert(e4.getMessage.contains("truncated inner event"))
  }

  import JsonDoc._
  private val docCols = Seq(Col("id", T_LONG), Col("doc", T_JSON, 4))
  private val beforeDoc = JObj(
    "name" -> JS("ada"),
    "tags" -> JArr(JS("a"), JS("b"), JS("c")),
    "meta" -> JObj("views" -> JI16(7), "ok" -> JBool(true)))
  private val beforeText =
    """{"name":"ada","tags":["a","b","c"],"meta":{"views":7,"ok":true}}"""

  test("PARTIAL_JSON: diff after-images reconstruct the full document (type 39)") {
    val b = new Builder(true).fde()
      .tableMap(23L, "testdb", "docs", docCols)
      .partialRows(23L, docCols, Seq(
        Seq(1, beforeDoc), // before: full document
        Seq(1, Partial(Seq(
          (0, "$.meta.views", JI16(8)),             // replace nested member
          (1, "$.tags[1]", JS("x")),                // insert into array
          (2, "$.name", null),                      // remove member
          (1, "$.added", JObj("k" -> JS("v"))))))))  // insert new member
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    assert(evs.length == 1 && evs(0).eventType == "PartialUpdateRowsEvent")
    assert(evs(0).rows.length == 2)
    assert(evs(0).rows(0)(1) == beforeText)
    assert(evs(0).rows(1)(1) ==
      """{"tags":["a","x","b","c"],"meta":{"views":8,"ok":true},"added":{"k":"v"}}""")
  }

  test("PARTIAL_JSON: empty diff, full value, NULL, root replace, quoted member") {
    val b = new Builder(true).fde()
      .tableMap(23L, "testdb", "docs", docCols)
      .partialRows(23L, docCols, Seq(
        Seq(1, beforeDoc), Seq(1, Partial(Seq.empty)),      // empty diff = unchanged
        Seq(2, beforeDoc), Seq(2, JArr(JI16(1))),           // full value, bit clear
        Seq(3, beforeDoc), Seq(3, null),                    // NULL after
        Seq(4, beforeDoc), Seq(4, Partial(Seq(
          (0, "$", JS("swapped"))))),                       // root replace
        Seq(5, beforeDoc), Seq(5, Partial(Seq(
          (1, "$.\"sp ace\"", JS("v")))))))                 // quoted member insert
    val evs = BinlogBinary.decodeFile(b.bytes, "f")
    val rows = evs(0).rows
    assert(rows(1)(1) == beforeText)         // unchanged round-trips verbatim
    assert(rows(3)(1) == "[1]")
    assert(rows(5)(1) == null)
    assert(rows(7)(1) == "\"swapped\"")
    assert(rows(9)(1) == beforeText.dropRight(1) + ""","sp ace":"v"}""")
  }

  test("PARTIAL_JSON: invalid diffs fail loudly") {
    val builder = new Builder(false)
    def diffs(ds: (Int, String, JsonDoc)*): Array[Byte] = builder.diffBytes(ds)
    // replace at a missing member
    val e1 = intercept[IllegalArgumentException] {
      graft.cdc.source.BinlogJsonDiff.applyDiffs("""{"a":1}""", diffs((0, "$.b", JI16(2))))
    }
    assert(e1.getMessage.contains("missing member"))
    // insert at an existing member
    val e2 = intercept[IllegalArgumentException] {
      graft.cdc.source.BinlogJsonDiff.applyDiffs("""{"a":1}""", diffs((1, "$.a", JI16(2))))
    }
    assert(e2.getMessage.contains("existing member"))
    // array index out of range
    val e3 = intercept[IllegalArgumentException] {
      graft.cdc.source.BinlogJsonDiff.applyDiffs("""[1,2]""", diffs((0, "$[5]", JI16(9))))
    }
    assert(e3.getMessage.contains("out-of-range"))
    // member step into a scalar
    val e4 = intercept[IllegalArgumentException] {
      graft.cdc.source.BinlogJsonDiff.applyDiffs("""{"a":1}""", diffs((0, "$.a.b", JI16(9))))
    }
    assert(e4.getMessage.contains("does not apply"))
    // remove at root
    val e5 = intercept[IllegalArgumentException] {
      graft.cdc.source.BinlogJsonDiff.applyDiffs("""{"a":1}""", diffs((2, "$", null)))
    }
    assert(e5.getMessage.contains("at root"))
  }

  test("PARTIAL_JSON: reconstructed after-image renders through toJson templates") {
    val dir = Files.createTempDirectory("binfeed-pjson")
    val b = new Builder(true).fde()
      .tableMap(23L, "testdb", "docs", docCols)
      .partialRows(23L, docCols, Seq(
        Seq(1, beforeDoc),
        Seq(1, Partial(Seq((0, "$.meta.views", JI16(8)))))))
    Files.write(dir.resolve("mysql-bin.000001.binlog"), b.bytes)
    val raw = spark.read.format("binlog-replay")
      .option("path", dir.toString).option("format", "binlog").load()
    val envelope = Decode.decode(raw, Map("testdb" -> Seq("docs")))
    val route = Route("docs", "collector", Seq("UPDATE"), "testdb.docs",
      """{"op":"{{ .Data.Operation }}","doc":{{ (index .Data.Rows 0).doc | toJson }}}""")
    val rendered = Routing.outbound(envelope, route)
      .select(col("payload")).collect().map(_.getString(0)).toSeq
    assert(rendered.size == 1)
    // the after image (views 7→8), embedded as a JSON-escaped string
    assert(rendered.head ==
      """{"op":"UPDATE","doc":"{\"name\":\"ada\",\"tags\":[\"a\",\"b\",\"c\"],\"meta\":{\"views\":8,\"ok\":true}}"}""")
  }
}
