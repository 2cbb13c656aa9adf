package graft.cdc.source

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Client half of the MySQL client/server wire protocol — exactly the
  * slice a replication client needs (the dialogue the reference gets
  * from go-mysql's BinlogSyncer, blreaderwork.go:51-61): packet framing,
  * the protocol-v10 handshake with mysql_native_password auth,
  * COM_QUERY / COM_REGISTER_SLAVE / COM_BINLOG_DUMP(_GTID), and the
  * GTID-set binary codec. All laid out from the public protocol
  * documentation; no client library.
  */
object MysqlWire {

  // command bytes
  val COM_QUERY = 0x03
  val COM_REGISTER_SLAVE = 0x15
  val COM_BINLOG_DUMP = 0x12
  val COM_BINLOG_DUMP_GTID = 0x1e

  // capability flags (the minimal modern-client set)
  val CLIENT_LONG_PASSWORD = 0x00000001L
  val CLIENT_SSL = 0x00000800L
  val CLIENT_PROTOCOL_41 = 0x00000200L
  val CLIENT_SECURE_CONNECTION = 0x00008000L
  val CLIENT_PLUGIN_AUTH = 0x00080000L

  val NativePasswordPlugin = "mysql_native_password"
  val CachingSha2Plugin = "caching_sha2_password"

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  /** Packet framing: 3-byte LE length + 1-byte sequence id + payload.
    * Payloads of 0xffffff bytes continue in the next packet (and a
    * payload of EXACTLY n·0xffffff is followed by an empty terminator
    * packet) — row events carrying large blobs genuinely exceed 16 MB,
    * so both directions speak the continuation protocol. */
  final class PacketIO(rawIn: InputStream, out: OutputStream) {
    private val in = new DataInputStream(rawIn)

    private def readOne(): (Int, Array[Byte]) = {
      val h = new Array[Byte](4)
      in.readFully(h)
      val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      val p = new Array[Byte](len)
      in.readFully(p)
      ((h(3) & 0xff), p)
    }

    def read(): (Int, Array[Byte]) = {
      val (seq, first) = readOne()
      if (first.length < 0xffffff) return (seq, first)
      val buf = new java.io.ByteArrayOutputStream()
      buf.write(first)
      var cont = true
      while (cont) {
        val (_, next) = readOne()
        buf.write(next)
        cont = next.length == 0xffffff
      }
      (seq, buf.toByteArray)
    }

    def write(seq: Int, payload: Array[Byte]): Unit = {
      var off = 0
      var s = seq
      var more = true
      while (more) {
        val n = math.min(payload.length - off, 0xffffff)
        out.write(le(n.toLong, 3))
        out.write(s & 0xff)
        out.write(payload, off, n)
        off += n
        s += 1
        // a full-length chunk needs a follow-up (possibly empty) packet
        more = n == 0xffffff
      }
      out.flush()
    }
  }

  /** Server ERR packet (0xff) → exception; anything else passes. */
  def checkNotErr(p: Array[Byte], stage: String): Array[Byte] = {
    if (p.nonEmpty && (p(0) & 0xff) == 0xff) {
      val code = (p(1) & 0xff) | ((p(2) & 0xff) << 8)
      // protocol-41 carries a '#' + 5-byte sqlstate before the message
      val msgOff = if (p.length > 3 && p(3) == '#') 9 else 3
      val msg = new String(p, msgOff, p.length - msgOff, StandardCharsets.UTF_8)
      throw new java.io.IOException(s"mysql $stage failed: error $code: $msg")
    }
    p
  }

  /** OK packet (0x00) expected; ERR explained, anything else refused. */
  def expectOk(p: Array[Byte], stage: String): Unit = {
    checkNotErr(p, stage)
    if (p.isEmpty || (p(0) & 0xff) != 0x00) {
      val first = if (p.isEmpty) "<empty>" else s"0x${(p(0) & 0xff).toHexString}"
      throw new java.io.IOException(s"mysql $stage: expected OK packet, got $first")
    }
  }

  final case class Handshake(serverVersion: String, threadId: Long,
      seed: Array[Byte], authPlugin: String, capabilities: Long = 0L)

  /** Initial handshake packet (protocol version 10): server version,
    * thread id, and the 20-byte auth seed split across two fields. */
  def parseHandshake(p: Array[Byte]): Handshake = {
    checkNotErr(p, "handshake")
    require((p(0) & 0xff) == 10, s"unsupported protocol version ${p(0) & 0xff}")
    var i = 1
    val verEnd = p.indexOf(0.toByte, i)
    val version = new String(p, i, verEnd - i, StandardCharsets.UTF_8)
    i = verEnd + 1
    val threadId = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    i += 4
    val seed1 = java.util.Arrays.copyOfRange(p, i, i + 8)
    i += 8 + 1 // seed part 1 + filler
    var caps = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) // capability flags (lower)
    i += 2
    var plugin = NativePasswordPlugin
    var seed2 = Array.empty[Byte]
    if (p.length > i) {
      i += 1 + 2 // charset, status
      caps |= ((p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8)) << 16 // flags (upper)
      i += 2
      val authDataLen = p(i) & 0xff
      i += 1 + 10 // len + reserved
      // part 2 is max(13, len-8) bytes, NUL-padded; the seed is 20 total
      val part2Len = math.max(13, authDataLen - 8)
      seed2 = java.util.Arrays.copyOfRange(p, i, i + math.max(0, authDataLen - 8 - 1))
      i += part2Len
      if (i < p.length) {
        val pluginEnd = p.indexOf(0.toByte, i)
        plugin = new String(p, i, (if (pluginEnd < 0) p.length else pluginEnd) - i,
          StandardCharsets.UTF_8)
      }
    }
    Handshake(version, threadId, seed1 ++ seed2, plugin, caps)
  }

  /** mysql_native_password token:
    * SHA1(password) XOR SHA1(seed ++ SHA1(SHA1(password))). */
  def nativePasswordToken(password: String, seed: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.empty
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes(StandardCharsets.UTF_8))
    sha1.reset()
    val p2 = sha1.digest(p1)
    sha1.reset()
    sha1.update(seed.take(20))
    sha1.update(p2)
    val mix = sha1.digest()
    p1.indices.foreach(i => p1(i) = (p1(i) ^ mix(i)).toByte)
    p1
  }

  /** caching_sha2_password token (MySQL 8's default plugin):
    * SHA256(password) XOR SHA256(SHA256(SHA256(password)) ++ seed). */
  def cachingSha2Token(password: String, seed: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.empty
    val sha = MessageDigest.getInstance("SHA-256")
    val p1 = sha.digest(password.getBytes(StandardCharsets.UTF_8))
    sha.reset()
    val p2 = sha.digest(sha.digest(p1))
    sha.reset()
    sha.update(p2)
    sha.update(seed.take(20))
    val mix = sha.digest()
    p1.indices.foreach(i => p1(i) = (p1(i) ^ mix(i)).toByte)
    p1
  }

  def tokenFor(plugin: String, password: String, seed: Array[Byte]): Array[Byte] =
    plugin match {
      case NativePasswordPlugin => nativePasswordToken(password, seed)
      case CachingSha2Plugin => cachingSha2Token(password, seed)
      case other =>
        throw new java.io.IOException(s"unsupported auth plugin $other")
    }

  private def clientCaps(ssl: Boolean): Long =
    CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41 |
      CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH |
      (if (ssl) CLIENT_SSL else 0L)

  /** SSLRequest: the 32-byte HandshakeResponse41 prefix (capabilities
    * with CLIENT_SSL, max packet, charset, filler) sent in place of the
    * full response; the client then upgrades the socket to TLS and sends
    * the real response (next sequence id) over the encrypted stream. */
  def sslRequest(): Array[Byte] =
    le(clientCaps(ssl = true), 4) ++ le(1L << 24, 4) ++ Array(33.toByte) ++
      Array.fill(23)(0.toByte)

  /** HandshakeResponse41 (the client's reply), speaking the server's
    * advertised plugin. */
  def handshakeResponse(user: String, password: String, seed: Array[Byte],
      plugin: String = NativePasswordPlugin, ssl: Boolean = false): Array[Byte] = {
    val token = tokenFor(plugin, password, seed)
    le(clientCaps(ssl), 4) ++ le(1L << 24, 4) ++ Array(33.toByte) ++ // max packet, utf8
      Array.fill(23)(0.toByte) ++
      user.getBytes(StandardCharsets.UTF_8) ++ Array(0.toByte) ++
      Array(token.length.toByte) ++ token ++
      plugin.getBytes(StandardCharsets.UTF_8) ++ Array(0.toByte)
  }

  /** Drive the post-handshake auth dialogue to an OK packet: handles
    * caching_sha2's fast-auth-success marker (0x01 0x03), its
    * perform-full-auth request (0x01 0x04 — over TLS the client answers
    * with the NUL-terminated cleartext password, which the encrypted
    * channel is what makes safe; on a plain connection it is REFUSED,
    * since sending it would leak the password and the RSA-key exchange
    * alternative is out of scope), and an auth-switch request
    * (0xfe + plugin + fresh seed). */
  def completeAuth(io: PacketIO, password: String, tls: Boolean = false): Unit = {
    var done = false
    while (!done) {
      val (seq, p) = io.read()
      checkNotErr(p, "auth")
      (p(0) & 0xff) match {
        case 0x00 => done = true
        case 0x01 if p.length >= 2 && (p(1) & 0xff) == 0x03 => // fast auth ok; OK follows
        case 0x01 if p.length >= 2 && (p(1) & 0xff) == 0x04 =>
          if (!tls) throw new java.io.IOException(
            "caching_sha2_password full authentication requires TLS (server cache miss)")
          io.write(seq + 1,
            password.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
        case 0xfe => // auth switch: [0xfe][plugin NUL][seed]
          val pluginEnd = {
            var i = 1; while (i < p.length && p(i) != 0) i += 1; i
          }
          val plugin = new String(p, 1, pluginEnd - 1, StandardCharsets.UTF_8)
          // seed is a FIXED 20 bytes followed by a documented NUL: take
          // exactly 20 when available rather than NUL-stripping, so a
          // 20-byte scramble that legitimately ends in 0x00 (with the
          // server omitting the terminator) keeps its last real byte;
          // NUL-strip only shorter/odd payloads.
          val seedStart = pluginEnd + 1
          val avail = p.length - seedStart
          val seed =
            if (avail >= 20) java.util.Arrays.copyOfRange(p, seedStart, seedStart + 20)
            else java.util.Arrays.copyOfRange(p, seedStart,
              math.max(seedStart, p.length - (if (avail > 0 && p.last == 0) 1 else 0)))
          io.write(seq + 1, tokenFor(plugin, password, seed))
        case other =>
          throw new java.io.IOException(s"unexpected auth packet 0x${other.toHexString}")
      }
    }
  }

  def comQuery(sql: String): Array[Byte] =
    COM_QUERY.toByte +: sql.getBytes(StandardCharsets.UTF_8)

  /** COM_REGISTER_SLAVE — announce ourselves as a replica
    * (go-mysql sends this before the dump; blreaderwork.go:51-61's
    * BinlogSyncer does it under StartSync). */
  def comRegisterSlave(serverId: Long, reportHost: String, reportPort: Int): Array[Byte] = {
    val h = reportHost.getBytes(StandardCharsets.UTF_8)
    Array(COM_REGISTER_SLAVE.toByte) ++ le(serverId, 4) ++
      Array(h.length.toByte) ++ h ++
      Array(0.toByte) ++ Array(0.toByte) ++ // empty user, password
      le(reportPort.toLong, 2) ++ le(0L, 4) ++ le(0L, 4) // rank, master id
  }

  /** COM_BINLOG_DUMP — stream events from (file, position). */
  def comBinlogDump(serverId: Long, file: String, pos: Long): Array[Byte] =
    Array(COM_BINLOG_DUMP.toByte) ++ le(pos, 4) ++ le(0L, 2) ++
      le(serverId, 4) ++ file.getBytes(StandardCharsets.UTF_8)

  /** COM_BINLOG_DUMP_GTID — stream everything NOT in `executed`. */
  def comBinlogDumpGtid(serverId: Long, executed: GtidSet): Array[Byte] = {
    val set = executed.encodeBinary
    Array(COM_BINLOG_DUMP_GTID.toByte) ++ le(0L, 2) ++ le(serverId, 4) ++
      le(0L, 4) ++ Array.empty[Byte] ++ // empty file name
      le(4L, 8) ++ // position 4 (ignored in GTID mode)
      le(set.length.toLong, 4) ++ set
  }
}

/** A MySQL GTID set ("uuid:1-5:7,uuid:9"): per-source-id sorted disjoint
  * inclusive intervals, with the binary encoding COM_BINLOG_DUMP_GTID
  * ships (n_sids, then per sid: 16 raw uuid bytes + interval pairs with
  * exclusive upper bounds). */
final case class GtidSet(intervals: Map[String, Vector[(Long, Long)]]) {

  def isEmpty: Boolean = intervals.isEmpty

  /** Record one executed transaction id. */
  def add(uuid: String, gno: Long): GtidSet = {
    val key = uuid.toLowerCase
    val merged = GtidSet.normalize(intervals.getOrElse(key, Vector.empty) :+ (gno, gno))
    GtidSet(intervals.updated(key, merged))
  }

  def merge(other: GtidSet): GtidSet =
    GtidSet((intervals.keySet ++ other.intervals.keySet).map { k =>
      k -> GtidSet.normalize(
        intervals.getOrElse(k, Vector.empty) ++ other.intervals.getOrElse(k, Vector.empty))
    }.toMap)

  def contains(uuid: String, gno: Long): Boolean =
    intervals.getOrElse(uuid.toLowerCase, Vector.empty)
      .exists { case (a, b) => gno >= a && gno <= b }

  def encodeBinary: Array[Byte] = {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    val sids = intervals.toSeq.sortBy(_._1)
    le(sids.size.toLong, 8) ++ sids.flatMap { case (uuid, ivs) =>
      GtidSet.uuidBytes(uuid) ++ le(ivs.size.toLong, 8) ++
        ivs.flatMap { case (a, b) => le(a, 8) ++ le(b + 1, 8) }
    }
  }

  override def toString: String =
    intervals.toSeq.sortBy(_._1).map { case (uuid, ivs) =>
      uuid + ":" + ivs.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }.mkString(":")
    }.mkString(",")
}

object GtidSet {
  val empty: GtidSet = GtidSet(Map.empty)

  /** Parse "uuid:1-5:7[,uuid2:...]"; "" → empty set. */
  def parse(s: String): GtidSet =
    if (s.trim.isEmpty) empty
    else GtidSet(s.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      val bits = part.split(':')
      require(bits.length >= 2, s"bad GTID '$part' (want uuid:interval[...])")
      val ivs = bits.tail.toVector.map { iv =>
        iv.split('-') match {
          case Array(a) => (a.toLong, a.toLong)
          case Array(a, b) => (a.toLong, b.toLong)
          case _ => throw new IllegalArgumentException(s"bad GTID interval '$iv'")
        }
      }
      bits(0).toLowerCase -> normalize(ivs)
    }.groupMapReduce(_._1)(_._2)((a, b) => normalize(a ++ b)))

  /** Sort and coalesce adjacent/overlapping inclusive intervals. */
  private[source] def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] =
    ivs.sorted.foldLeft(Vector.empty[(Long, Long)]) { (acc, iv) =>
      acc.lastOption match {
        case Some((a, b)) if iv._1 <= b + 1 => acc.init :+ (a, math.max(b, iv._2))
        case _ => acc :+ iv
      }
    }

  /** "3e11fa47-71ca-11e1-9e33-c80aa9429562" → 16 raw bytes. */
  def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"bad uuid '$uuid'")
    (0 until 16).map(i =>
      Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte).toArray
  }

  def uuidString(b: Array[Byte], off: Int): String = {
    val hex = (0 until 16).map(i => f"${b(off + i) & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** Binary form → set (the fake-server test decodes what the client
    * sent; a real server does the same). */
  def decodeBinary(b: Array[Byte], off: Int): GtidSet = {
    def u64(p: Int): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
      v
    }
    var p = off
    val nSids = u64(p); p += 8
    val m = (0L until nSids).map { _ =>
      val uuid = uuidString(b, p); p += 16
      val nIv = u64(p); p += 8
      val ivs = (0L until nIv).map { _ =>
        val a = u64(p); val z = u64(p + 8); p += 16
        (a, z - 1)
      }.toVector
      uuid -> normalize(ivs)
    }.toMap
    GtidSet(m)
  }
}
