package graft.cdc.source

import java.io.IOException
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.zip.CRC32

/** The LIVE replication-client [[EventFeed]] (the last slice of A1): a
  * thread that speaks the MySQL replication wire dialogue — protocol
  * handshake, mysql_native_password auth, checksum announcement,
  * COM_REGISTER_SLAVE, then COM_BINLOG_DUMP (file/position) or
  * COM_BINLOG_DUMP_GTID (executed-set) — and spools the streamed binlog
  * event bytes into local `<binlogfile>.binlog` relay segments, exactly
  * the layering a MySQL replica uses (network stream → relay log →
  * consumers). Reads delegate to [[BinlogFileFeed]] over the spool, so
  * `open(segment, from, to)` is crash-repeatable and executors never
  * need the server connection. Reference dialogue being matched:
  * go-mysql BinlogSyncer.StartSync consumed at blreaderwork.go:51-61,
  * 119-140.
  *
  * Resume contract: on (re)connect the dump request continues from the
  * spool — GTID mode sends startGtid ∪ (GTIDs already spooled); file
  * mode sends (last segment, its last event's end position). Replayed
  * bytes for in-flight events can duplicate spool entries only at the
  * torn tail, and delivery stays at-least-once with the same
  * idempotency keys as every other feed.
  *
  * Stream framing: each packet is 0x00 + a verbatim binlog event
  * (header + body + CRC as written on the master), 0xfe = clean EOF
  * (non-blocking dump drained), 0xff = server error. Heartbeats are
  * dropped; an artificial ROTATE (timestamp 0) switches the spool
  * segment without being written twice into an existing segment.
  */
/** @param tlsMode the mysql-client `--ssl-mode` family (an extension —
  *   the reference never exposes go-mysql's TLSConfig): "disabled"
  *   (default), "required" (encrypt WITHOUT certificate verification —
  *   MySQL's documented REQUIRED semantics, not a shortcut), "verify_ca"
  *   (validate the chain against `tlsCa` or the JVM default trust
  *   store), or "verify_identity" (verify_ca + hostname check).
  * @param tlsCa X.509 certificate file (PEM or DER) to trust for
  *   verify_ca / verify_identity — the `--ssl-ca` analog.
  * @param readTimeoutMs socket SO_TIMEOUT (source.readTimeout): a master
  *   silent for longer trips SocketTimeoutException → reconnect; pairs
  *   with the announced heartbeat so a healthy-but-idle stream stays up.
  * @param heartbeatPeriodMs requested master heartbeat interval, sent as
  *   `SET @master_heartbeat_period` in nanoseconds (the statement
  *   go-mysql issues for BinlogSyncerConfig.HeartbeatPeriod); 0 = none.
  * @param restartOnError server.restartSyncerOnError: false = the first
  *   stream error stops the tail (lastError keeps the cause) instead of
  *   reconnect-with-backoff. */
final class ReplicationFeed(host: String, port: Int, user: String,
    password: String, slaveServerId: Long, spoolDir: String,
    tlsMode: String = "disabled", tlsCa: Option[String] = None,
    readTimeoutMs: Long = 90000L, heartbeatPeriodMs: Long = 60000L,
    restartOnError: Boolean = true)
    extends EventFeed with AutoCloseable {

  require(Set("disabled", "required", "verify_ca", "verify_identity")(tlsMode),
    s"unsupported tlsMode '$tlsMode'")

  /** Full-options identity for the per-(endpoint, spool) feed cache: a
    * restarted query whose credentials/TLS/timeout options changed must
    * NOT silently reuse a feed built from the old options. */
  private[source] val optionsFingerprint: String =
    ReplicationFeed.fingerprint(user, password, slaveServerId, tlsMode,
      tlsCa, readTimeoutMs, heartbeatPeriodMs, restartOnError)
  // go-mysql guards exactly this: with heartbeat >= read timeout an IDLE
  // healthy master times the socket out before any heartbeat arrives,
  // cycling reconnects forever
  require(heartbeatPeriodMs <= 0 || readTimeoutMs <= 0 ||
    heartbeatPeriodMs < readTimeoutMs,
    s"heartbeatPeriodMs ($heartbeatPeriodMs) must be < readTimeoutMs ($readTimeoutMs)")

  private val files = new BinlogFileFeed(spoolDir)
  Files.createDirectories(Paths.get(spoolDir))

  @volatile private var flavor = "mysql"
  @volatile private var startGtid: Option[String] = None
  @volatile private var closed = false
  @volatile private var liveSocket: Socket = _
  @volatile private var started = false
  /** Last stream error, surfaced for tests/observability. */
  @volatile private[cdc] var lastError: String = _
  /** restartOnError=false + a stream error: the tail has stopped for
    * good, and every read-surface call must FAIL rather than serve the
    * frozen spool as healthy empty batches (the reference exits the
    * process in this path — a silent stall would invert that). */
  @volatile private var failed = false

  // ---- resume state (guarded by the tail thread only) ----
  private var currentFile: String = _
  private var currentPos: Long = 4L
  private var executed: GtidSet = GtidSet.empty
  // mariadb dialect: latest (serverId, seqNo) per replication domain —
  // exactly the shape @slave_connect_state takes ("domain-server-seq")
  private var mariadbExec: Map[Long, (Long, Long)] = Map.empty
  // a GTID only joins the executed state once its TRANSACTION COMPLETES
  // (XID commit) — counting it at GTID-event time would let a reconnect
  // skip a transaction whose rows were only partially received (real
  // replicas track Retrieved_Gtid_Set the same way)
  private var pendingGtid: Option[(String, Long)] = None
  private var pendingMariadb: Option[(Long, Long, Long)] = None
  private var checksummed = false // from the streamed FDE

  private def checkNotFailed(): Unit =
    if (failed) throw new IOException(
      s"replication tail stopped (restartSyncerOnError=false): $lastError")

  override def segments(): Seq[String] = { checkNotFailed(); files.segments() }
  override def extent(segment: String): Long = { checkNotFailed(); files.extent(segment) }
  override def open(segment: String, from: Long, to: Long): FeedEventReader = {
    checkNotFailed(); files.open(segment, from, to)
  }

  /** Replication hints are REAL here: flavor picks the dialect spoken,
    * startGtid the resume mode. First call starts the tail thread. */
  override def configure(flavor: String, startGtid: Option[String]): Unit = {
    this.flavor = flavor
    this.startGtid = startGtid.filter(_.nonEmpty)
    synchronized {
      if (!started) {
        started = true
        recoverFromSpool()
        tail = mkTail()
        tail.start()
      } else if (failed && !closed) {
        // a supervisor-restarted query re-enters here: give the stopped
        // tail a fresh attempt instead of serving the poisoned surface
        // forever (the feed is cached per (endpoint, spool) for the JVM)
        failed = false
        tail = mkTail()
        tail.start()
      }
    }
  }

  /** Resume point from existing relay segments: last segment name + the
    * end offset of its last complete event IN THAT SEGMENT (positions
    * reset at each rotation — carrying one across would resume a fresh
    * file at the previous file's offset and skip its head), and the
    * COMMITTED GTIDs the bytes carry (GTID-mode resume across process
    * restarts; a trailing uncommitted transaction stays un-counted so
    * the server re-serves it). */
  private def recoverFromSpool(): Unit = {
    val segs = files.segments()
    segs.foreach { seg =>
      currentPos = 4L // each segment starts over; only ITS events count
      scanSegment(Paths.get(spoolDir).resolve(seg)) { (evType, serverId, body, logPos) =>
        trackGtidEvent(evType, serverId, body)
        if (logPos > 0) currentPos = logPos
      }
    }
    // an uncommitted trailing transaction never joins the resume state
    pendingGtid = None
    pendingMariadb = None
    segs.lastOption.foreach(s => currentFile = s.stripSuffix(".binlog"))
  }

  /** Shared GTID bookkeeping for the live stream and spool recovery:
    * GTID events PEND, the XID commit (type 16) PROMOTES. A new GTID
    * event discards an unpromoted predecessor (its transaction was cut
    * short and will be re-fetched). */
  private def trackGtidEvent(evType: Int, serverId: Long, body: Array[Byte]): Unit =
    evType match {
      case 33 if body.length >= 25 =>
        pendingGtid = Some((GtidSet.uuidString(body, 1), leU64(body, 17)))
      case 162 if body.length >= 12 =>
        pendingMariadb = Some((leU32(body, 8), serverId, leU64(body, 0)))
      case 16 => // XID: the open transaction is durable in the relay
        pendingGtid.foreach { case (uuid, gno) => executed = executed.add(uuid, gno) }
        pendingMariadb.foreach { case (d, s, q) => trackMariadb(d, s, q) }
        pendingGtid = None
        pendingMariadb = None
      case _ => ()
    }

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def leU64(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def trackMariadb(domain: Long, server: Long, seq: Long): Unit =
    if (mariadbExec.get(domain).forall(_._2 < seq))
      mariadbExec = mariadbExec.updated(domain, (server, seq))

  /** @slave_connect_state value: startGtid entries ("d-s-seq[,...]")
    * merged with what the relay has seen, latest seq per domain. */
  private def mariadbState: String = {
    val start = startGtid.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map { g =>
        val Array(d, s, q) = g.split('-').map(_.toLong)
        (d, (s, q))
      }
    val merged = (start ++ mariadbExec.toSeq)
      .groupMapReduce(_._1)(_._2)((a, b) => if (a._2 >= b._2) a else b)
    merged.toSeq.sortBy(_._1)
      .map { case (d, (s, q)) => s"$d-$s-$q" }.mkString(",")
  }

  /** Drop a torn (incomplete) trailing event from a relay segment. */
  private def truncateTornTail(p: Path): Unit = {
    val b = Files.readAllBytes(p)
    var pos = 4
    var ok = pos
    while (pos + 19 <= b.length) {
      val evSize = (b(pos + 9) & 0xff) | ((b(pos + 10) & 0xff) << 8) |
        ((b(pos + 11) & 0xff) << 16) | ((b(pos + 12) & 0xff) << 24)
      if (evSize < 19 || pos + evSize > b.length) pos = b.length
      else { pos += evSize; ok = pos }
    }
    if (ok < b.length) {
      val ch = FileChannel.open(p, StandardOpenOption.WRITE)
      try ch.truncate(ok.toLong) finally ch.close()
    }
  }

  /** Walk complete events of one relay segment (header-level only). */
  private def scanSegment(p: Path)(f: (Int, Long, Array[Byte], Long) => Unit): Unit = {
    if (!Files.exists(p)) return
    val b = Files.readAllBytes(p)
    var pos = 4
    while (pos + 19 <= b.length) {
      val evType = b(pos + 4) & 0xff
      val serverId = leU32(b, pos + 5)
      val evSize = (b(pos + 9) & 0xff) | ((b(pos + 10) & 0xff) << 8) |
        ((b(pos + 11) & 0xff) << 16) | ((b(pos + 12) & 0xff) << 24)
      if (evSize < 19 || pos + evSize > b.length) return
      val logPos = (b(pos + 13) & 0xffL) | ((b(pos + 14) & 0xffL) << 8) |
        ((b(pos + 15) & 0xffL) << 16) | ((b(pos + 16) & 0xffL) << 24)
      f(evType, serverId, java.util.Arrays.copyOfRange(b, pos + 19, pos + evSize), logPos)
      pos += evSize
    }
  }

  @volatile private var tail: Thread = _

  private def mkTail(): Thread = {
    val t = new Thread(() => {
      var backoffMs = 50L
    var stopped = false
    while (!closed && !stopped) {
      val drained =
        try { streamOnce(); true }
        catch {
          case _: Throwable if closed => true
          case e: Throwable =>
            lastError = e.getMessage
            if (!restartOnError) {
              System.err.println(
                s"[replication-feed] $host:$port: ${e.getMessage}; " +
                  "restartSyncerOnError=false, stopping the tail")
              failed = true // poison reads: the next poll fails the query
              stopped = true
            } else System.err.println(
              s"[replication-feed] $host:$port: ${e.getMessage}; retrying in ${backoffMs}ms")
            false
        }
      if (!closed && !stopped) {
        try Thread.sleep(backoffMs) catch { case _: InterruptedException => () }
        // clean EOF = a non-blocking dump drained: steady re-poll.
        // Errors back off exponentially like the socket feed.
        backoffMs = if (drained) 500L else math.min(math.max(backoffMs, 50L) * 2, 5000L)
      }
    }
    }, s"replication-feed-$host:$port")
    t.setDaemon(true)
    t
  }

  /** TLS client upgrade of the already-connected socket, per `tlsMode`.
    * "required" trusts any certificate (MySQL's REQUIRED = encryption
    * only); verify_ca/verify_identity build the trust from `tlsCa`
    * (one PEM/DER certificate) or fall back to the JVM default. */
  private def upgradeTls(plain: Socket): javax.net.ssl.SSLSocket = {
    import javax.net.ssl._
    val trust: Array[TrustManager] =
      if (tlsMode == "required")
        Array(new X509TrustManager {
          override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
        })
      else tlsCa match {
        case Some(path) =>
          val cf = java.security.cert.CertificateFactory.getInstance("X.509")
          val in = Files.newInputStream(Paths.get(path))
          val cert = try cf.generateCertificate(in) finally in.close()
          val ks = java.security.KeyStore.getInstance(
            java.security.KeyStore.getDefaultType)
          ks.load(null, null)
          ks.setCertificateEntry("ca", cert)
          val tmf = TrustManagerFactory.getInstance(
            TrustManagerFactory.getDefaultAlgorithm)
          tmf.init(ks)
          tmf.getTrustManagers
        case None => null // JVM default trust store
      }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, trust, null)
    val ssl = ctx.getSocketFactory
      .createSocket(plain, host, port, true).asInstanceOf[SSLSocket]
    if (tlsMode == "verify_identity") {
      val params = ssl.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(params)
    }
    ssl.startHandshake()
    ssl
  }

  /** One connection lifetime: dialogue + event stream until EOF/error. */
  private def streamOnce(): Unit = {
    val plain = new Socket()
    plain.connect(new InetSocketAddress(host, port), 5000)
    // source.readTimeout: a silent master trips SocketTimeoutException →
    // reconnect; the announced heartbeat keeps a healthy idle stream live
    if (readTimeoutMs > 0) plain.setSoTimeout(
      math.min(readTimeoutMs, Int.MaxValue.toLong).toInt)
    liveSocket = plain
    var sock: Socket = plain
    var channel: FileChannel = null
    try {
      var io = new MysqlWire.PacketIO(sock.getInputStream, sock.getOutputStream)
      // 1. handshake + auth (native or caching_sha2 fast path, with
      // auth-switch handling — the MySQL 8 default dialogue); with TLS
      // on, an SSLRequest goes out first and the socket upgrades before
      // any credential material flows
      val (hsSeq, hs) = io.read()
      val h = MysqlWire.parseHandshake(hs)
      val tls = tlsMode != "disabled"
      var respSeq = hsSeq + 1
      if (tls) {
        if ((h.capabilities & MysqlWire.CLIENT_SSL) == 0L)
          throw new IOException(
            s"tlsMode=$tlsMode but the server does not advertise CLIENT_SSL")
        io.write(respSeq, MysqlWire.sslRequest())
        sock = upgradeTls(plain)
        liveSocket = sock
        io = new MysqlWire.PacketIO(sock.getInputStream, sock.getOutputStream)
        respSeq += 1
      }
      io.write(respSeq,
        MysqlWire.handshakeResponse(user, password, h.seed, h.authPlugin, ssl = tls))
      MysqlWire.completeAuth(io, password, tls)
      // 2. declare checksum awareness (go-mysql parity) + mariadb GTID pos
      io.write(0, MysqlWire.comQuery(
        "SET @master_binlog_checksum= @@global.binlog_checksum"))
      MysqlWire.expectOk(io.read()._2, "set checksum")
      // request master heartbeats (source.heartbeatPeriod, nanoseconds —
      // the statement go-mysql issues for HeartbeatPeriod); type-27
      // heartbeat events are dropped from the spool on arrival
      if (heartbeatPeriodMs > 0) {
        io.write(0, MysqlWire.comQuery(
          s"SET @master_heartbeat_period=${heartbeatPeriodMs * 1000000L}"))
        MysqlWire.expectOk(io.read()._2, "set heartbeat period")
      }
      // mariadb dialect: announce the GTID position (start ∪ relay) —
      // the server resolves the dump start from it
      val mariadbGtidMode = flavor == "mariadb" &&
        (startGtid.nonEmpty || mariadbExec.nonEmpty)
      if (mariadbGtidMode) {
        io.write(0, MysqlWire.comQuery(s"SET @slave_connect_state='$mariadbState'"))
        MysqlWire.expectOk(io.read()._2, "set slave_connect_state")
      }
      // 3. register as a replica
      io.write(0, MysqlWire.comRegisterSlave(slaveServerId, host, port))
      MysqlWire.expectOk(io.read()._2, "register slave")
      // 4. dump: GTID mode (mysql flavor with a start set) or file mode
      val gtidMode = flavor == "mysql" && startGtid.nonEmpty
      if (gtidMode) {
        val set = GtidSet.parse(startGtid.get).merge(executed)
        io.write(0, MysqlWire.comBinlogDumpGtid(slaveServerId, set))
      } else if (mariadbGtidMode) {
        // position comes from the announced GTID state
        io.write(0, MysqlWire.comBinlogDump(slaveServerId, "", 4L))
      } else {
        io.write(0, MysqlWire.comBinlogDump(
          slaveServerId, Option(currentFile).getOrElse(""), currentPos))
      }
      // 5. event stream
      def openSeg(name: String): FileChannel = {
        val p = Paths.get(spoolDir, s"$name.binlog")
        val fresh = !Files.exists(p)
        if (!fresh) truncateTornTail(p) // a crash mid-append leaves a
        // half event; the resumed stream restarts at the last COMPLETE
        // event, so the torn bytes must go or they'd corrupt the append
        val ch = FileChannel.open(p,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        if (fresh) ch.write(ByteBuffer.wrap(BinlogBinary.Magic))
        ch
      }
      if (currentFile != null) channel = openSeg(currentFile)
      var running = true
      while (running && !closed) {
        val (_, p) = io.read()
        (p(0) & 0xff) match {
          case 0xfe if p.length < 9 => running = false // EOF: dump drained
          case 0xff => MysqlWire.checkNotErr(p, "binlog stream")
          case 0x00 =>
            val ev = java.util.Arrays.copyOfRange(p, 1, p.length)
            val evType = ev(4) & 0xff
            val ts = (ev(0) & 0xffL) | ((ev(1) & 0xffL) << 8) |
              ((ev(2) & 0xffL) << 16) | ((ev(3) & 0xffL) << 24)
            val logPos = (ev(13) & 0xffL) | ((ev(14) & 0xffL) << 8) |
              ((ev(15) & 0xffL) << 16) | ((ev(16) & 0xffL) << 24)
            evType match {
              case 27 => // heartbeat: keepalive only, never spooled
              case 4 => // ROTATE
                val artificial = ts == 0L && logPos == 0L
                // strip a verified CRC once; reused for the name parse
                // and (on a fresh segment) the spool write
                val stripped = if (artificial) stripChecksumIfPresent(ev) else ev
                val (nextPos, nextFile) = parseRotate(ev, stripped, artificial)
                if (!artificial && channel != null)
                  channel.write(ByteBuffer.wrap(ev)) // real rotate ends the old file
                if (currentFile != nextFile) {
                  if (channel != null) channel.close()
                  val fresh = !Files.exists(Paths.get(spoolDir, s"$nextFile.binlog"))
                  channel = openSeg(nextFile)
                  // write the artificial rotate once per fresh segment so
                  // replayed file bookkeeping (A18) survives in the relay
                  if (artificial && fresh)
                    channel.write(ByteBuffer.wrap(stripped))
                }
                currentFile = nextFile
                currentPos = math.max(nextPos, 4L)
              case _ =>
                if (evType == 15) { // FORMAT_DESCRIPTION: learn checksum mode
                  val serverVersion = new String(ev, 19 + 2, 50,
                    java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != 0)
                  if (BinlogBinary.versionAtLeast561(serverVersion))
                    checksummed = (ev(ev.length - 5) & 0xff) == 1
                }
                if (evType == 33 || evType == 162 || evType == 16)
                  trackGtidEvent(evType, leU32(ev, 5),
                    if (evType == 16) Array.empty
                    else java.util.Arrays.copyOfRange(ev, 19, ev.length))
                if (channel == null)
                  throw new IOException("event stream started without a ROTATE")
                // a reconnect re-sends the FDE with its original early
                // log_pos; appending it mid-file would duplicate FDE
                // bytes in the segment on EVERY reconnect cycle. Skip
                // it when the spool is already past it (mirror of the
                // artificial-rotate write-once guard); a fresh segment
                // (currentPos at the magic) still gets its FDE.
                if (!(evType == 15 && logPos <= currentPos))
                  channel.write(ByteBuffer.wrap(ev))
                // never move the resume point BACKWARD: a re-sent FDE on
                // reconnect carries its original early log_pos, and
                // honoring it would re-request (and re-spool) the file
                if (logPos > currentPos) currentPos = logPos
            }
          case other =>
            throw new IOException(s"unexpected stream packet 0x${other.toHexString}")
        }
      }
      sock.close()
    } finally {
      if (channel != null) channel.close()
      try sock.close() catch { case _: Throwable => () }
    }
  }

  /** ROTATE body → (next position, next file name). The artificial
    * rotate arrives BEFORE the FDE, so its checksum presence is unknown;
    * the caller passes the verification-stripped bytes (false positive
    * odds 2^-32). Mid-stream rotates use the FDE-declared mode. */
  private def parseRotate(ev: Array[Byte], stripped: Array[Byte],
      artificial: Boolean): (Long, String) = {
    val end =
      if (artificial) stripped.length
      else if (checksummed) ev.length - 4
      else ev.length
    (leU64(ev, 19),
      new String(ev, 19 + 8, end - 19 - 8, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Return the event without its CRC32 trailer if one verifies — with
    * the header's event-size field patched to match, so the stripped
    * bytes stay a well-formed spooled event. */
  private def stripChecksumIfPresent(ev: Array[Byte]): Array[Byte] = {
    if (ev.length < 23) return ev
    val crc = new CRC32()
    crc.update(ev, 0, ev.length - 4)
    val stored = (ev(ev.length - 4) & 0xffL) | ((ev(ev.length - 3) & 0xffL) << 8) |
      ((ev(ev.length - 2) & 0xffL) << 16) | ((ev(ev.length - 1) & 0xffL) << 24)
    if (crc.getValue != stored) return ev
    val out = java.util.Arrays.copyOfRange(ev, 0, ev.length - 4)
    val size = out.length
    out(9) = (size & 0xff).toByte
    out(10) = ((size >> 8) & 0xff).toByte
    out(11) = ((size >> 16) & 0xff).toByte
    out(12) = ((size >> 24) & 0xff).toByte
    out
  }

  /** Executed-GTID view (start ∪ streamed), for tests/observability. */
  private[source] def executedGtids: GtidSet =
    startGtid.map(GtidSet.parse).getOrElse(GtidSet.empty).merge(executed)

  override def close(): Unit = {
    closed = true
    val s = liveSocket
    if (s != null) try s.close() catch { case _: Throwable => () }
    val t = tail
    if (t != null) t.interrupt() // null if configure() never ran
  }
}

object ReplicationFeed {
  /** Canonical option fingerprint shared by the feed and the
    * [[BinlogReplaySource]] cache-hit guard -- one format, so the two
    * sites can never drift. NUL-joined (via the escape sequence; no
    * legal option value contains one), so distinct option sets never
    * collide. */
  private[source] def fingerprint(user: String, password: String,
      slaveServerId: Long, tlsMode: String, tlsCa: Option[String],
      readTimeoutMs: Long, heartbeatPeriodMs: Long,
      restartOnError: Boolean): String =
    Seq(user, password, slaveServerId, tlsMode, tlsCa.getOrElse(""),
      readTimeoutMs, heartbeatPeriodMs, restartOnError).mkString("\u0000")
}
