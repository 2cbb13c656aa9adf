package graft.cdc

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.CopyOnWriteArrayList
import java.util.zip.CRC32

import graft.cdc.source.{GtidSet, MysqlWire}

/** In-test MySQL server speaking the SERVER half of the replication
  * dialogue — handshake v10, mysql_native_password verification,
  * COM_QUERY/COM_REGISTER_SLAVE acks, COM_BINLOG_DUMP(_GTID) event
  * streaming with the 0x00 OK prefix — serving fixture binlog bytes
  * built by [[BinlogFixture.Builder]]. The auth check recomputes the
  * scramble with MessageDigest directly (not via the client helper), so
  * the token algebra is verified, not mirrored.
  *
  * `binlogs` is call-by-name: tests swap in longer fixture bytes to
  * exercise resume. Every dump request is recorded for assertions.
  */
final class FakeMysqlServer(password: String,
    binlogs: => Map[String, Array[Byte]],
    closeAfterStream: Boolean = false,
    // advertised auth plugin (MySQL 8 defaults to caching_sha2_password)
    authPlugin: String = MysqlWire.NativePasswordPlugin,
    // ask the client to re-authenticate with native + a fresh seed
    forceAuthSwitch: Boolean = false,
    // caching_sha2 server cache miss: demand full authentication (the
    // client refuses on a plain connection; over TLS it answers with
    // the NUL-terminated cleartext password, verified here)
    sha2FullAuth: Boolean = false,
    // server-side TLS: accept an SSLRequest and upgrade the connection
    tls: Option[javax.net.ssl.SSLContext] = None,
    // kill the connection MID-event: the FIRST time an event of this
    // type streams, send only half of its framed packet and hard-close
    // the socket — the torn wire write a crashing master produces.
    // Later dumps stream the event normally (resume tests).
    cutOnceMidEventType: Int = -1) extends AutoCloseable {

  @volatile var cuts = 0
  // raw socket stream of the connection served by THIS thread (for the
  // torn-packet write, which must bypass PacketIO's whole-frame write)
  private val rawOutTL = new ThreadLocal[java.io.OutputStream]()

  val registered = new CopyOnWriteArrayList[Long]()
  val queries = new CopyOnWriteArrayList[String]()
  val dumps = new CopyOnWriteArrayList[(String, Long)]()
  val gtidDumps = new CopyOnWriteArrayList[String]()
  @volatile var authFailures = 0
  @volatile var tlsSessions = 0

  private val server = new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  @volatile private var closed = false

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  private val okPacket = Array[Byte](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00)
  private def errPacket(code: Int, msg: String): Array[Byte] =
    Array(0xff.toByte) ++ le(code.toLong, 2) ++ "#28000".getBytes ++
      msg.getBytes(StandardCharsets.UTF_8)

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => try serve(sock) catch { case _: Throwable => () }
          finally { try sock.close() catch { case _: Throwable => () } })
        t.setDaemon(true); t.start()
      } catch { case _: Throwable if closed => () case _: Throwable => () }
    }
  }, "fake-mysql-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Expected native-password token, computed independently:
    * SHA1(pwd) XOR SHA1(seed ++ SHA1(SHA1(pwd))). */
  private def expectedToken(seed: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.empty
    val d = MessageDigest.getInstance("SHA-1")
    val h1 = d.digest(password.getBytes(StandardCharsets.UTF_8))
    d.reset(); val h2 = d.digest(h1)
    d.reset(); d.update(seed); d.update(h2)
    val mix = d.digest()
    h1.zip(mix).map { case (a, b) => (a ^ b).toByte }
  }

  /** Expected caching_sha2 token, computed independently:
    * SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ seed). */
  private def expectedSha2Token(seed: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.empty
    val d = MessageDigest.getInstance("SHA-256")
    val h1 = d.digest(password.getBytes(StandardCharsets.UTF_8))
    d.reset(); val h2 = d.digest(d.digest(h1))
    d.reset(); d.update(h2); d.update(seed)
    val mix = d.digest()
    h1.zip(mix).map { case (a, b) => (a ^ b).toByte }
  }

  private def serve(plainSock: Socket): Unit = {
    var sock = plainSock
    var io = new MysqlWire.PacketIO(sock.getInputStream, sock.getOutputStream)
    rawOutTL.set(sock.getOutputStream)
    val rnd = new scala.util.Random()
    val seed = Array.fill[Byte](20)((rnd.nextInt(94) + 33).toByte) // printable, no NULs
    // ---- handshake (protocol v10) ----
    val hs = Array[Byte](10) ++
      "8.0.32-fake".getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0) ++
      le(42L, 4) ++ seed.take(8) ++ Array[Byte](0) ++
      le(0xffffL, 2) ++ Array(33.toByte) ++ le(2L, 2) ++ // lower caps incl CLIENT_SSL
      le((MysqlWire.CLIENT_PLUGIN_AUTH >> 16) & 0xffff, 2) ++
      Array(21.toByte) ++ Array.fill[Byte](10)(0) ++
      seed.drop(8) ++ Array[Byte](0) ++
      authPlugin.getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0)
    io.write(0, hs)
    var (respSeq, resp) = io.read()
    // a 32-byte response with CLIENT_SSL set is an SSLRequest: upgrade
    // the socket server-side, then read the real HandshakeResponse41
    val respCaps = (resp(0) & 0xffL) | ((resp(1) & 0xffL) << 8) |
      ((resp(2) & 0xffL) << 16) | ((resp(3) & 0xffL) << 24)
    if (resp.length == 32 && (respCaps & MysqlWire.CLIENT_SSL) != 0L) {
      val ctx = tls.getOrElse(sys.error("client sent SSLRequest but server has no TLS"))
      val ssl = ctx.getSocketFactory.createSocket(sock, null, 0, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(false)
      ssl.startHandshake()
      tlsSessions += 1
      sock = ssl
      io = new MysqlWire.PacketIO(sock.getInputStream, sock.getOutputStream)
      rawOutTL.set(sock.getOutputStream)
      // real servers keep sequencing across the upgrade: handshake=0,
      // SSLRequest=1, HandshakeResponse=2, our auth reply=3
      val post = io.read()
      respSeq = post._1
      resp = post._2
    }
    // HandshakeResponse41: caps(4) maxPacket(4) charset(1) filler(23) user\0 authLen token
    var i = 32
    val userEnd = resp.indexOf(0.toByte, i)
    i = userEnd + 1
    val tokenLen = resp(i) & 0xff
    var token = java.util.Arrays.copyOfRange(resp, i + 1, i + 1 + tokenLen)
    var verifySeed = seed
    var verifyPlugin = authPlugin
    var seqOut = respSeq + 1
    if (forceAuthSwitch) {
      // AuthSwitchRequest: 0xfe + plugin NUL + fresh seed NUL
      val seed2 = Array.fill[Byte](20)((rnd.nextInt(94) + 33).toByte)
      io.write(seqOut, Array(0xfe.toByte) ++
        MysqlWire.NativePasswordPlugin.getBytes(StandardCharsets.UTF_8) ++
        Array[Byte](0) ++ seed2 ++ Array[Byte](0))
      val (s2, reply) = io.read()
      token = reply
      verifySeed = seed2
      verifyPlugin = MysqlWire.NativePasswordPlugin
      seqOut = s2 + 1
    }
    val expected =
      if (verifyPlugin == MysqlWire.CachingSha2Plugin) expectedSha2Token(verifySeed)
      else expectedToken(verifySeed)
    if (!java.util.Arrays.equals(token, expected)) {
      authFailures += 1
      io.write(seqOut, errPacket(1045, "Access denied for replication user"))
      return
    }
    if (verifyPlugin == MysqlWire.CachingSha2Plugin) {
      if (sha2FullAuth) {
        io.write(seqOut, Array(0x01.toByte, 0x04.toByte)) // perform full auth
        if (!sock.isInstanceOf[javax.net.ssl.SSLSocket])
          return // client must refuse without TLS
        // over TLS the client answers with the NUL-terminated cleartext
        val (s3, clear) = io.read()
        val sent = new String(clear, 0, math.max(0, clear.length - 1),
          StandardCharsets.UTF_8)
        if (sent != password) {
          authFailures += 1
          io.write(s3 + 1, errPacket(1045, "Access denied (full auth)"))
          return
        }
        seqOut = s3 + 1
      } else {
        io.write(seqOut, Array(0x01.toByte, 0x03.toByte)) // fast auth success
        seqOut += 1
      }
    }
    io.write(seqOut, okPacket)
    // ---- command loop ----
    var open = true
    var connectState: Option[String] = None // mariadb @slave_connect_state
    while (open && !closed) {
      val (_, cmd) = io.read()
      (cmd(0) & 0xff) match {
        case MysqlWire.COM_QUERY =>
          val q = new String(cmd, 1, cmd.length - 1, StandardCharsets.UTF_8)
          queries.add(q)
          if (q.contains("@slave_connect_state"))
            connectState = Some(q.split('\'')(1))
          io.write(1, okPacket)
        case MysqlWire.COM_REGISTER_SLAVE =>
          registered.add((cmd(1) & 0xffL) | ((cmd(2) & 0xffL) << 8) |
            ((cmd(3) & 0xffL) << 16) | ((cmd(4) & 0xffL) << 24))
          io.write(1, okPacket)
        case MysqlWire.COM_BINLOG_DUMP =>
          val pos = (cmd(1) & 0xffL) | ((cmd(2) & 0xffL) << 8) |
            ((cmd(3) & 0xffL) << 16) | ((cmd(4) & 0xffL) << 24)
          val file = new String(cmd, 11, cmd.length - 11, StandardCharsets.UTF_8)
          dumps.add((file, pos))
          streamFileMode(io, file, pos, connectState)
          open = endStream(io, sock)
        case MysqlWire.COM_BINLOG_DUMP_GTID =>
          // [cmd][flags 2][serverId 4][nameLen 4 = 0][pos 8][setLen 4][set]
          val setLen = (cmd(19) & 0xffL) | ((cmd(20) & 0xffL) << 8) |
            ((cmd(21) & 0xffL) << 16) | ((cmd(22) & 0xffL) << 24)
          require(cmd.length == 23 + setLen, "bad DUMP_GTID frame")
          val set = GtidSet.decodeBinary(cmd, 23)
          gtidDumps.add(set.toString)
          streamGtidMode(io, set)
          open = endStream(io, sock)
        case other =>
          io.write(1, errPacket(1047, s"unknown command $other"))
      }
    }
  }

  /** End-of-dump: EOF packet (client returns cleanly) or a hard close
    * (client sees an IOException and reconnects with backoff). */
  private def endStream(io: MysqlWire.PacketIO, sock: Socket): Boolean =
    if (closeAfterStream) { sock.close(); false }
    else { io.write(0, Array(0xfe.toByte)); false }

  /** Split fixture bytes into (type, endPos, verbatim event bytes). */
  private def splitEvents(bytes: Array[Byte]): Vector[(Int, Long, Array[Byte])] = {
    val out = Vector.newBuilder[(Int, Long, Array[Byte])]
    var p = 4
    while (p + 19 <= bytes.length) {
      val t = bytes(p + 4) & 0xff
      val size = (bytes(p + 9) & 0xff) | ((bytes(p + 10) & 0xff) << 8) |
        ((bytes(p + 11) & 0xff) << 16) | ((bytes(p + 12) & 0xff) << 24)
      val logPos = (bytes(p + 13) & 0xffL) | ((bytes(p + 14) & 0xffL) << 8) |
        ((bytes(p + 15) & 0xffL) << 16) | ((bytes(p + 16) & 0xffL) << 24)
      out += ((t, logPos, java.util.Arrays.copyOfRange(bytes, p, p + size)))
      p += size
    }
    out.result()
  }

  private var seq = 0
  private def sendEvent(io: MysqlWire.PacketIO, ev: Array[Byte]): Unit = {
    seq = (seq + 1) & 0xff
    if (cutOnceMidEventType >= 0 && cuts == 0 &&
        (ev(4) & 0xff) == cutOnceMidEventType) {
      cuts += 1
      val payload = 0x00.toByte +: ev
      val torn = Array[Byte]((payload.length & 0xff).toByte,
        ((payload.length >> 8) & 0xff).toByte,
        ((payload.length >> 16) & 0xff).toByte, seq.toByte) ++
        payload.take(payload.length / 2)
      val out = rawOutTL.get()
      out.write(torn); out.flush()
      throw new java.io.IOException("torn mid-event (test cut)")
    }
    io.write(seq, 0x00.toByte +: ev)
  }

  /** Artificial rotate: timestamp 0, log_pos 0, CRC32 trailer (the
    * master checksums generated events too — the client must detect and
    * strip it before it knows the FDE's algorithm). */
  private def artificialRotate(io: MysqlWire.PacketIO, name: String, pos: Long): Unit = {
    val body = le(pos, 8) ++ name.getBytes(StandardCharsets.UTF_8)
    val size = 19 + body.length + 4
    val header = le(0L, 4) ++ Array(4.toByte) ++ le(1L, 4) ++
      le(size.toLong, 4) ++ le(0L, 4) ++ le(0L, 2)
    val crc = new CRC32()
    crc.update(header); crc.update(body)
    sendEvent(io, header ++ body ++ le(crc.getValue, 4))
  }

  private def streamFileMode(io: MysqlWire.PacketIO, reqFile: String, reqPos: Long,
      connectState: Option[String] = None): Unit = {
    seq = 0
    val names = binlogs.keys.toSeq.sorted
    val name = if (reqFile.isEmpty) names.head else reqFile
    val evs = splitEvents(binlogs(name))
    artificialRotate(io, name, math.max(reqPos, 4L))
    connectState match {
      case None =>
        sendEvent(io, evs.head._3) // FDE always re-sent
        evs.tail.filter(_._2 > math.max(reqPos, evs.head._2))
          .foreach(e => sendEvent(io, e._3))
      case Some(state) =>
        // mariadb dialect: transaction groups delimited by GTID events
        // (type 162, body = seq u64 LE + domain u32 LE); serve a group
        // iff its seq is past the announced per-domain position
        val doneSeq: Map[Long, Long] = state.split(',').filter(_.nonEmpty).map { g =>
          val Array(d, _, q) = g.split('-').map(_.toLong); d -> q
        }.toMap
        val (preamble, rest) = evs.span(_._1 != 162)
        preamble.foreach(e => sendEvent(io, e._3))
        var skip = false
        rest.foreach { case (t, _, bytes) =>
          if (t == 162) {
            var sq = 0L; var i = 19 + 7
            while (i >= 19) { sq = (sq << 8) | (bytes(i) & 0xffL); i -= 1 }
            val domain = (bytes(19 + 8) & 0xffL) | ((bytes(19 + 9) & 0xffL) << 8) |
              ((bytes(19 + 10) & 0xffL) << 16) | ((bytes(19 + 11) & 0xffL) << 24)
            skip = doneSeq.get(domain).exists(sq <= _)
          }
          if (!skip) sendEvent(io, bytes)
        }
    }
  }

  /** GTID mode: transaction groups are delimited by GTID events; a group
    * streams iff its gno is NOT in the client's executed set. Events
    * before the first GTID event (FDE, shared TABLE_MAP) always go. */
  private def streamGtidMode(io: MysqlWire.PacketIO, executed: GtidSet): Unit = {
    seq = 0
    val name = binlogs.keys.toSeq.sorted.head
    val evs = splitEvents(binlogs(name))
    artificialRotate(io, name, 4L)
    val (preamble, rest) = evs.span(_._1 != 33)
    preamble.foreach(e => sendEvent(io, e._3))
    var skip = false
    rest.foreach { case (t, _, bytes) =>
      if (t == 33) {
        val uuid = GtidSet.uuidString(bytes, 19 + 1)
        var gno = 0L; var i = 19 + 24
        while (i >= 19 + 17) { gno = (gno << 8) | (bytes(i) & 0xffL); i -= 1 }
        skip = executed.contains(uuid, gno)
      }
      if (!skip) sendEvent(io, bytes)
    }
  }

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
  }
}
