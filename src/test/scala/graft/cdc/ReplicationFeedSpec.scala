package graft.cdc

import java.nio.file.Files

import graft.SparkTestBase
import graft.cdc.source.{BinlogBinary, GtidSet, ReplicationFeed}

/** The live replication wire dialogue end to end (the last slice of A1):
  * handshake → native-password auth → checksum announcement → register →
  * COM_BINLOG_DUMP(_GTID) → event stream → relay spool → the UNCHANGED
  * decode/route/sink pipeline, against [[FakeMysqlServer]] serving
  * fixture bytes from the independent [[BinlogFixture.Builder]] encoder.
  * Reference dialogue: go-mysql BinlogSyncer.StartSync as consumed at
  * blreaderwork.go:51-61,119-140. */
class ReplicationFeedSpec extends SparkTestBase {
  import BinlogFixture._
  import BinlogBinary._

  private val cols = Seq(Col("id", T_LONG), Col("name", T_VARCHAR, 255))

  /** fde + tableMap + n single-row writes (ids 1..n). */
  private def fixture(n: Int): Array[Byte] = {
    val b = new Builder(true).fde().tableMap(7L, "testdb", "users", cols)
    (1 to n).foreach(i => b.rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(i, s"u$i"))))
    b.bytes
  }

  private def drain(feed: ReplicationFeed): Seq[source.FeedEvent] =
    feed.segments().flatMap { seg =>
      val r = feed.open(seg, 0, Long.MaxValue)
      val evs = Iterator.continually(r).takeWhile(_.next()).map(_.get()).toSeq
      r.close(); evs
    }

  private def awaitEvents(feed: ReplicationFeed, n: Long, timeoutSec: Int = 30): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1e9.toLong
    while (feed.segments().map(feed.extent).sum < n) {
      assert(System.nanoTime() < deadline,
        s"relay spool did not reach $n events in time (lastError=${feed.lastError})")
      Thread.sleep(50)
    }
  }

  test("full dialogue: handshake, auth, register, dump, stream, decode") {
    val server = new FakeMysqlServer("sekret", Map("mysql-bin.000001" -> fixture(3)))
    val dir = Files.createTempDirectory("repl-e2e").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "sekret", 7777L, dir)
    try {
      feed.configure("mysql", None)
      // artificial rotate + 3 writes
      awaitEvents(feed, 4)
      val evs = drain(feed)
      assert(evs.map(_.eventType) ==
        Seq("RotateEvent", "WriteRowsEventV2", "WriteRowsEventV2", "WriteRowsEventV2"))
      assert(evs.drop(1).map(_.rows(0)(0)) == Seq("1", "2", "3"))
      assert(evs.drop(1).forall(e => e.database == "testdb" && e.table == "users"))
      // the dialogue really ran: registration + checksum announcement +
      // heartbeat request + a dump from the start of the stream
      assert(server.registered.contains(7777L))
      assert(server.queries.toArray.exists(
        _.toString.contains("@master_binlog_checksum")))
      assert(server.queries.toArray.exists(
        _.toString.contains("@master_heartbeat_period=60000000000")))
      assert(server.dumps.get(0) == (("", 4L)))
      assert(server.authFailures == 0)
    } finally { feed.close(); server.close() }
  }

  test("wrong password is refused by the server and surfaces as an error") {
    val server = new FakeMysqlServer("sekret", Map("mysql-bin.000001" -> fixture(1)))
    val dir = Files.createTempDirectory("repl-auth").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "wrong", 1L, dir)
    try {
      feed.configure("mysql", None)
      val deadline = System.nanoTime() + 20e9.toLong
      while (server.authFailures == 0 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(server.authFailures >= 1)
      Thread.sleep(200)
      assert(feed.segments().map(feed.extent).sum == 0L, "no events may flow unauthenticated")
      assert(Option(feed.lastError).exists(_.contains("Access denied")))
    } finally { feed.close(); server.close() }
  }

  test("caching_sha2_password fast path (MySQL 8 default plugin)") {
    val server = new FakeMysqlServer("s3cr3t", Map("mysql-bin.000001" -> fixture(2)),
      authPlugin = graft.cdc.source.MysqlWire.CachingSha2Plugin)
    val dir = Files.createTempDirectory("repl-sha2").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "s3cr3t", 4L, dir)
    try {
      feed.configure("mysql", None)
      awaitEvents(feed, 3)
      assert(drain(feed).count(_.eventType == "WriteRowsEventV2") == 2)
      assert(server.authFailures == 0)
    } finally { feed.close(); server.close() }
  }

  test("auth-switch request re-authenticates with the named plugin and fresh seed") {
    val server = new FakeMysqlServer("pw2", Map("mysql-bin.000001" -> fixture(1)),
      authPlugin = graft.cdc.source.MysqlWire.CachingSha2Plugin, forceAuthSwitch = true)
    val dir = Files.createTempDirectory("repl-switch").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw2", 5L, dir)
    try {
      feed.configure("mysql", None)
      awaitEvents(feed, 2)
      assert(drain(feed).count(_.eventType == "WriteRowsEventV2") == 1)
      assert(server.authFailures == 0)
    } finally { feed.close(); server.close() }
  }

  test("caching_sha2 full-auth demand is refused loudly (needs TLS)") {
    val server = new FakeMysqlServer("pw3", Map("mysql-bin.000001" -> fixture(1)),
      authPlugin = graft.cdc.source.MysqlWire.CachingSha2Plugin, sha2FullAuth = true)
    val dir = Files.createTempDirectory("repl-fullauth").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw3", 6L, dir)
    try {
      feed.configure("mysql", None)
      val deadline = System.nanoTime() + 20e9.toLong
      while (feed.lastError == null && System.nanoTime() < deadline) Thread.sleep(20)
      assert(Option(feed.lastError).exists(_.contains("full authentication")))
      assert(feed.segments().map(feed.extent).sum == 0L)
    } finally { feed.close(); server.close() }
  }

  test("reconnect resumes the dump from the last spooled position, no duplicates") {
    // server hard-closes after each stream (no EOF packet) — the client
    // must reconnect with backoff and continue where the relay ends
    @volatile var bytes = fixture(2)
    val server = new FakeMysqlServer("pw",
      Map("mysql-bin.000001" -> bytes), closeAfterStream = true)
    val dir = Files.createTempDirectory("repl-resume").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 2L, dir)
    try {
      feed.configure("mysql", None)
      awaitEvents(feed, 3) // rotate + 2 writes
      bytes = fixture(4)   // two MORE transactions appear on the master
      awaitEvents(feed, 5)
      val evs = drain(feed)
      // every row exactly once, in order — at-least-once with no replays
      // because every reconnect asked for the exact relay end position
      assert(evs.filter(_.eventType == "WriteRowsEventV2").map(_.rows(0)(0)) ==
        Seq("1", "2", "3", "4"))
      val resumes = (0 until server.dumps.size).map(server.dumps.get)
      assert(resumes.head == (("", 4L)))
      // later dumps name the spooled file and a position past the start
      assert(resumes.tail.forall { case (f, p) => f == "mysql-bin.000001" && p > 4L })
      // every dump re-sends the FDE (as real masters do) but the spool
      // must hold it exactly ONCE — re-appending it mid-file on each
      // reconnect cycle would grow the segment and diverge its layout
      val raw = Files.readAllBytes(
        java.nio.file.Paths.get(dir, "mysql-bin.000001.binlog"))
      var p = 4; var fdes = 0
      while (p + 19 <= raw.length) {
        if ((raw(p + 4) & 0xff) == 15) fdes += 1
        val size = (raw(p + 9) & 0xff) | ((raw(p + 10) & 0xff) << 8) |
          ((raw(p + 11) & 0xff) << 16) | ((raw(p + 12) & 0xff) << 24)
        p += size
      }
      assert(fdes == 1, s"spool holds $fdes FDEs after reconnect cycles")
    } finally { feed.close(); server.close() }
  }

  test("LIVE feed: compressed transaction + partial-JSON update; cut " +
      "mid-payload resumes at the payload-event boundary, no dup/lost rows") {
    import JsonDoc._
    val docCols = Seq(Col("id", T_LONG), Col("doc", T_JSON, 4))
    val beforeDoc = JObj("name" -> JS("ada"), "meta" -> JObj("views" -> JI16(7)))
    // fde + tableMap + one PARTIAL_JSON update (type 39), then a zstd
    // TRANSACTION_PAYLOAD (type 40, 2 inner writes), then a plain write
    // — the binlog a MySQL >= 8.0.20 with default
    // binlog_transaction_compression=ON actually ships.
    val b = new Builder(true).fde()
      .tableMap(23L, "testdb", "docs", docCols)
      .partialRows(23L, docCols, Seq(
        Seq(1, beforeDoc),
        Seq(1, Partial(Seq((0, "$.meta.views", JI16(8)))))))
    val payloadStart = b.lastPos // the transaction's only resumable offset
    b.txnPayload(compress = true) { inner =>
      inner.tableMap(7L, "testdb", "users", cols)
        .rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(10, "u10")))
        .rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(11, "u11")))
      ()
    }
    b.rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(12, "u12")))

    // the server tears the wire HALFWAY through the payload event's
    // packet on its first send — a master crash mid-transaction
    val server = new FakeMysqlServer("pw",
      Map("mysql-bin.000001" -> b.bytes),
      cutOnceMidEventType = TRANSACTION_PAYLOAD_EVENT)
    val dir = Files.createTempDirectory("repl-txn40").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 3L, dir)
    try {
      feed.configure("mysql", None)
      // rotate + partial + 2 inner writes + trailing write = 5
      awaitEvents(feed, 5, timeoutSec = 60)
      assert(server.cuts == 1, "the torn send must have happened")
      val evs = drain(feed)
      assert(evs.map(_.eventType) == Seq("RotateEvent", "PartialUpdateRowsEvent",
        "WriteRowsEventV2", "WriteRowsEventV2", "WriteRowsEventV2"))
      // partial-JSON after-image reconstructed from the before-image
      val partial = evs(1)
      assert(partial.rows(0)(1) == """{"name":"ada","meta":{"views":7}}""")
      assert(partial.rows(1)(1) == """{"name":"ada","meta":{"views":8}}""")
      // compressed-transaction rows + the trailing write: exactly once,
      // in order, across the reconnect
      assert(evs.drop(2).map(_.rows(0)(0)) == Seq("10", "11", "12"))
      // the reconnect asked for the PAYLOAD-EVENT BOUNDARY: everything
      // before the torn transaction was spooled and must not re-stream
      val resumes = (0 until server.dumps.size).map(server.dumps.get)
      assert(resumes.head == (("", 4L)))
      assert(resumes.tail.nonEmpty &&
        resumes.tail.head == (("mysql-bin.000001", payloadStart)),
        s"expected resume at payload boundary $payloadStart, got ${resumes.tail}")
      // the spool holds exactly ONE copy of the payload event and no
      // torn bytes: walk the segment's event headers end to end
      val raw = Files.readAllBytes(
        java.nio.file.Paths.get(dir, "mysql-bin.000001.binlog"))
      var p = 4; var payloads = 0
      while (p + 19 <= raw.length) {
        if ((raw(p + 4) & 0xff) == TRANSACTION_PAYLOAD_EVENT) payloads += 1
        val size = (raw(p + 9) & 0xff) | ((raw(p + 10) & 0xff) << 8) |
          ((raw(p + 11) & 0xff) << 16) | ((raw(p + 12) & 0xff) << 24)
        p += size
      }
      assert(p == raw.length, "spool must end on an event boundary (no torn tail)")
      assert(payloads == 1, s"spool holds $payloads payload events")
    } finally { feed.close(); server.close() }
  }

  private val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  /** fde + tableMap + 3 GTID-delimited single-row transactions, each
    * closed by its XID commit (the event that promotes a GTID into the
    * client's executed set — an uncommitted tail must be re-fetched). */
  private def gtidFixture: Array[Byte] = {
    val b = new Builder(true).fde().tableMap(7L, "testdb", "users", cols)
    def le8(v: Long): Array[Byte] =
      (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    (1 to 3).foreach { gno =>
      b.event(33, Array(1.toByte) ++ GtidSet.uuidBytes(uuid) ++ le8(gno.toLong))
      b.rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(gno, s"u$gno")))
      b.event(16, le8(gno.toLong)) // XID
    }
    b.bytes
  }

  test("GTID mode: dump carries startGtid, streams only missing transactions") {
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> gtidFixture))
    val dir = Files.createTempDirectory("repl-gtid").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 3L, dir)
    try {
      feed.configure("mysql", Some(s"$uuid:1-2"))
      awaitEvents(feed, 2) // rotate + the ONE missing write (gno 3)
      val evs = drain(feed)
      assert(evs.filter(_.eventType == "WriteRowsEventV2").map(_.rows(0)(0)) == Seq("3"))
      assert(server.gtidDumps.get(0) == s"$uuid:1-2")
    } finally { feed.close(); server.close() }
  }

  test("GTID resume across restarts: spooled GTIDs rejoin the executed set") {
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> gtidFixture))
    val dir = Files.createTempDirectory("repl-gtid-resume").toString
    val feed1 = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 3L, dir)
    try {
      feed1.configure("mysql", Some(s"$uuid:1"))
      awaitEvents(feed1, 3) // rotate + writes for gnos 2, 3
      assert(drain(feed1).filter(_.eventType == "WriteRowsEventV2")
        .map(_.rows(0)(0)) == Seq("2", "3"))
    } finally feed1.close()
    // a fresh process over the same relay spool: recovery must re-derive
    // executed = start ∪ spooled GTIDs, so the next dump skips everything
    val feed2 = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 3L, dir)
    try {
      feed2.configure("mysql", Some(s"$uuid:1"))
      val deadline = System.nanoTime() + 20e9.toLong
      while (server.gtidDumps.size < 2 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(server.gtidDumps.get(1) == s"$uuid:1-3")
      Thread.sleep(200)
      assert(feed2.segments().map(feed2.extent).sum == 3L, "no duplicate events on resume")
    } finally { feed2.close(); server.close() }
  }

  /** fde + tableMap + 3 MariaDB-GTID-delimited single-row transactions
    * (type 162: body = seq u64 LE + domain u32 LE + flags). */
  private def mariadbFixture: Array[Byte] = {
    val b = new Builder(true).fde().tableMap(7L, "testdb", "users", cols)
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    (1 to 3).foreach { seqNo =>
      b.event(162, le(seqNo.toLong, 8) ++ le(0L, 4) ++ Array(0.toByte))
      b.rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(seqNo, s"u$seqNo")))
      b.event(16, le(seqNo.toLong, 8)) // XID commit promotes the GTID
    }
    b.bytes
  }

  test("mariadb dialect: @slave_connect_state resume from start ∪ relay GTIDs") {
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> mariadbFixture))
    val dir = Files.createTempDirectory("repl-mariadb").toString
    val feed1 = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 3L, dir)
    try {
      feed1.configure("mariadb", Some("0-1-1"))
      awaitEvents(feed1, 3) // rotate + writes for seqs 2, 3
      assert(drain(feed1).filter(_.eventType == "WriteRowsEventV2")
        .map(_.rows(0)(0)) == Seq("2", "3"))
      assert(server.queries.toArray.exists(
        _.toString.contains("@slave_connect_state='0-1-1'")))
    } finally feed1.close()
    // fresh process over the same relay: recovery merges the spooled
    // mariadb GTIDs (seq 3, server id from the event header) into the
    // announced state, so nothing is re-served
    val feed2 = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 3L, dir)
    try {
      feed2.configure("mariadb", Some("0-1-1"))
      val deadline = System.nanoTime() + 20e9.toLong
      while (!server.queries.toArray.exists(
          _.toString.contains("@slave_connect_state='0-1-3'")) &&
          System.nanoTime() < deadline) Thread.sleep(20)
      assert(server.queries.toArray.exists(
        _.toString.contains("@slave_connect_state='0-1-3'")))
      Thread.sleep(200)
      assert(feed2.segments().map(feed2.extent).sum == 3L, "no duplicates on resume")
    } finally { feed2.close(); server.close() }
  }

  test("packet framing speaks the 16MB continuation protocol both ways") {
    import graft.cdc.source.MysqlWire
    // 0xffffff + 5 bytes: one full chunk + a 5-byte continuation; the
    // exact-boundary case needs a trailing EMPTY terminator packet
    for (size <- Seq(0xffffff + 5, 0xffffff, 1, 0)) {
      val payload = Array.tabulate[Byte](size)(i => (i * 31).toByte)
      val sink = new java.io.ByteArrayOutputStream()
      new MysqlWire.PacketIO(
        new java.io.ByteArrayInputStream(Array.empty), sink).write(3, payload)
      val framed = sink.toByteArray
      if (size == 0xffffff) // full chunk ⇒ header(4) + chunk + empty packet header(4)
        assert(framed.length == 4 + size + 4)
      val (seq, got) = new MysqlWire.PacketIO(
        new java.io.ByteArrayInputStream(framed),
        new java.io.ByteArrayOutputStream()).read()
      assert(seq == 3 && got.length == size)
      assert(java.util.Arrays.equals(got, payload), s"payload mismatch at size $size")
    }
  }

  test("a partially received transaction's GTID is NOT counted as executed") {
    // fixture's last transaction has its GTID + rows but NO XID commit —
    // as if the connection died mid-transaction. The reconnect's dump
    // set must exclude it so the server re-serves the whole transaction.
    def le8(v: Long): Array[Byte] =
      (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    val b = new Builder(true).fde().tableMap(7L, "testdb", "users", cols)
    b.event(33, Array(1.toByte) ++ GtidSet.uuidBytes(uuid) ++ le8(3L))
    b.rows(WRITE_ROWS_V2, 7L, cols, Seq(Seq(3, "u3")))
    // no XID — transaction torn here
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> b.bytes),
      closeAfterStream = true)
    val dir = Files.createTempDirectory("repl-torn-trx").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 9L, dir)
    try {
      feed.configure("mysql", Some(s"$uuid:1-2"))
      val deadline = System.nanoTime() + 20e9.toLong
      while (server.gtidDumps.size < 2 && System.nanoTime() < deadline) Thread.sleep(20)
      // BOTH dump requests carry only the committed set — gno 3 pends
      // forever until an XID arrives, so it is always re-fetched
      assert(server.gtidDumps.get(0) == s"$uuid:1-2")
      assert(server.gtidDumps.get(1) == s"$uuid:1-2")
    } finally { feed.close(); server.close() }
  }

  test("recovery after a rotation resumes the NEW file at position 4") {
    // relay state after a rotation + crash: segment 1 holds real events
    // (high end positions), segment 2 only the magic so far. Resuming
    // must ask for (file 2, pos 4) — carrying file 1's offset into file
    // 2 would silently skip the head of the new file.
    val server = new FakeMysqlServer("pw",
      Map("mysql-bin.000001" -> fixture(2), "mysql-bin.000002" -> fixture(1)))
    val dir = Files.createTempDirectory("repl-rotate-recover")
    Files.write(dir.resolve("mysql-bin.000001.binlog"), fixture(2))
    Files.write(dir.resolve("mysql-bin.000002.binlog"),
      Array(0xfe.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte))
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 10L, dir.toString)
    try {
      feed.configure("mysql", None)
      val deadline = System.nanoTime() + 20e9.toLong
      while (server.dumps.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      assert(server.dumps.get(0) == (("mysql-bin.000002", 4L)),
        s"dump must restart the rotated-to file at 4, got ${server.dumps.get(0)}")
    } finally { feed.close(); server.close() }
  }

  test("replication feed drives the full config-driven sync pipeline") {
    CollectingConnector.clear()
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> fixture(5)))
    val dir = Files.createTempDirectory("repl-sync").toString
    val cfg = Config.parse(
      s"""{"serverId": "repl1", "dbTables": {"testdb": ["users"]},
         |  "sourceFormat": "replication", "sourcePath": "$dir",
         |  "sourceHost": "127.0.0.1", "sourcePort": ${server.port},
         |  "sourceUser": "repl", "sourcePassword": "pw",
         |  "connectors": [{"name": "sinkR", "type": "collect"}],
         |  "routes": [{"name": "r", "connector": "sinkR",
         |    "operations": ["INSERT"], "dbTable": "testdb.users",
         |    "template": "{{ (index .Data.Rows 0).id }}:{{ (index .Data.Rows 0).name }}"}]}""".stripMargin)
    try {
      // pre-warm the registry feed so the spool holds all events before
      // the AvailableNow cap freezes (same trick as SocketFeedSpec)
      // restartOnError=false matches what the config layer passes for
      // this pipeline — the cache-hit guard refuses mismatched options
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("format", "replication", "host", "127.0.0.1",
          "port", server.port.toString, "user", "repl", "password", "pw",
          "restartOnError", "false"))
      val feed = graft.cdc.source.BinlogFeeds.forOptions(dir, opts)
        .asInstanceOf[ReplicationFeed]
      awaitEvents(feed, 6)
      val ckpt = Files.createTempDirectory("repl-sync-ckpt").toString
      val q = CdcPipeline.sync(spark, cfg, cfg.sourcePath, ckpt)
      q.awaitTermination(60000)
      val got = CollectingConnector.drain("sinkR").map(_._2).sorted
      assert(got == (1 to 5).map(i => s"$i:u$i").sorted)
    } finally server.close()
  }

  test("feed cache refuses a reconfigured stream with changed options (ADVICE r5)") {
    val server = new FakeMysqlServer("pw-a", Map("mysql-bin.000001" -> fixture(1)))
    val dir = Files.createTempDirectory("repl-cache-guard").toString
    def opts(password: String) = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("format", "replication", "host", "127.0.0.1",
        "port", server.port.toString, "user", "repl", "password", password))
    try {
      val feed = graft.cdc.source.BinlogFeeds.forOptions(dir, opts("pw-a"))
        .asInstanceOf[ReplicationFeed]
      awaitEvents(feed, 2)
      // same options: the cached feed is reused
      assert(graft.cdc.source.BinlogFeeds.forOptions(dir, opts("pw-a")) eq feed)
      // changed credentials: loud refusal, NOT silent reuse of the old
      // connection (and not a second feed appending to the same spool)
      val e = intercept[IllegalArgumentException] {
        graft.cdc.source.BinlogFeeds.forOptions(dir, opts("pw-b"))
      }
      assert(e.getMessage.contains("different options"), e.getMessage)
    } finally server.close()
  }

  /** Self-signed server TLS material (keytool PKCS12, SAN=localhost +
    * 127.0.0.1) + the exported CA certificate PEM — the --ssl-ca shape. */
  private def tlsMaterial(): (javax.net.ssl.SSLContext, java.nio.file.Path) = {
    val dir = Files.createTempDirectory("repl-tls-ks")
    val ks = dir.resolve("ks.p12")
    val gen = new ProcessBuilder(
      "keytool", "-genkeypair", "-alias", "my", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1",
      "-keystore", ks.toString, "-storetype", "PKCS12", "-storepass", "changeit")
      .redirectErrorStream(true).start()
    assert(gen.waitFor() == 0, "keytool -genkeypair failed")
    val pem = dir.resolve("ca.pem")
    val exp = new ProcessBuilder(
      "keytool", "-exportcert", "-rfc", "-alias", "my",
      "-keystore", ks.toString, "-storepass", "changeit", "-file", pem.toString)
      .redirectErrorStream(true).start()
    assert(exp.waitFor() == 0, "keytool -exportcert failed")
    val keyStore = java.security.KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(ks)
    try keyStore.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(keyStore, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    (ctx, pem)
  }

  test("tlsMode=required: SSLRequest upgrade, credentials flow encrypted") {
    val (ctx, _) = tlsMaterial()
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> fixture(2)),
      tls = Some(ctx))
    val dir = Files.createTempDirectory("repl-tls").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 8L, dir,
      tlsMode = "required")
    try {
      feed.configure("mysql", None)
      awaitEvents(feed, 3)
      assert(drain(feed).filter(_.eventType == "WriteRowsEventV2")
        .map(_.rows(0)(0)) == Seq("1", "2"))
      assert(server.tlsSessions >= 1, "the dialogue must have upgraded to TLS")
      assert(server.authFailures == 0)
    } finally { feed.close(); server.close() }
  }

  test("caching_sha2 full authentication completes over TLS") {
    val (ctx, _) = tlsMaterial()
    val server = new FakeMysqlServer("fullpw", Map("mysql-bin.000001" -> fixture(1)),
      authPlugin = graft.cdc.source.MysqlWire.CachingSha2Plugin,
      sha2FullAuth = true, tls = Some(ctx))
    val dir = Files.createTempDirectory("repl-tls-full").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "fullpw", 9L, dir,
      tlsMode = "required")
    try {
      feed.configure("mysql", None)
      awaitEvents(feed, 2) // the plain-connection twin of this test refuses
      assert(drain(feed).count(_.eventType == "WriteRowsEventV2") == 1)
      assert(server.tlsSessions >= 1 && server.authFailures == 0)
    } finally { feed.close(); server.close() }
  }

  test("verify_ca trusts the announced CA; verify_identity also checks the host") {
    val (ctx, pem) = tlsMaterial()
    for (mode <- Seq("verify_ca", "verify_identity")) {
      val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> fixture(1)),
        tls = Some(ctx))
      val dir = Files.createTempDirectory(s"repl-$mode").toString
      // SAN carries ip:127.0.0.1, so verify_identity passes against the ip
      val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 10L, dir,
        tlsMode = mode, tlsCa = Some(pem.toString))
      try {
        feed.configure("mysql", None)
        awaitEvents(feed, 2)
        assert(drain(feed).count(_.eventType == "WriteRowsEventV2") == 1, mode)
        assert(server.authFailures == 0, mode)
      } finally { feed.close(); server.close() }
    }
  }

  test("restartSyncerOnError=false stops the tail on the first stream error") {
    val server = new FakeMysqlServer("right", Map("mysql-bin.000001" -> fixture(1)))
    val dir = Files.createTempDirectory("repl-norestart").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "wrong", 13L, dir,
      restartOnError = false)
    try {
      feed.configure("mysql", None)
      val deadline = System.nanoTime() + 20e9.toLong
      while (feed.lastError == null && System.nanoTime() < deadline) Thread.sleep(20)
      assert(Option(feed.lastError).exists(_.contains("Access denied")))
      Thread.sleep(1500) // with restart ON the backoff loop would retry by now
      assert(server.authFailures == 1,
        s"no reconnect allowed, saw ${server.authFailures} auth attempts")
      // the stop is LOUD: the read surface fails the next poll instead
      // of serving the frozen spool as healthy empty batches
      intercept[java.io.IOException](feed.segments())
      // a supervisor-restarted query re-configures the cached feed: the
      // poisoned state clears and the tail gets ONE fresh attempt
      feed.configure("mysql", None)
      val d2 = System.nanoTime() + 20e9.toLong
      while (server.authFailures < 2 && System.nanoTime() < d2) Thread.sleep(20)
      assert(server.authFailures == 2, "re-configure must retry exactly once")
    } finally { feed.close(); server.close() }
  }

  test("TLS survives reconnects: every resumed dump re-upgrades the channel") {
    val (ctx, _) = tlsMaterial()
    @volatile var bytes = fixture(2)
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> bytes),
      closeAfterStream = true, tls = Some(ctx))
    val dir = Files.createTempDirectory("repl-tls-resume").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 12L, dir,
      tlsMode = "required")
    try {
      feed.configure("mysql", None)
      awaitEvents(feed, 3)
      bytes = fixture(4) // two MORE transactions appear on the master
      awaitEvents(feed, 5)
      val evs = drain(feed)
      assert(evs.filter(_.eventType == "WriteRowsEventV2").map(_.rows(0)(0)) ==
        Seq("1", "2", "3", "4"))
      // the hard close forced ≥2 connections; each one spoke TLS
      assert(server.tlsSessions >= 2, s"tlsSessions=${server.tlsSessions}")
      assert(server.authFailures == 0)
    } finally { feed.close(); server.close() }
  }

  test("verify_ca rejects a server whose chain the CA did not sign") {
    val (serverCtx, _) = tlsMaterial()
    val (_, strangerPem) = tlsMaterial() // an unrelated CA
    val server = new FakeMysqlServer("pw", Map("mysql-bin.000001" -> fixture(1)),
      tls = Some(serverCtx))
    val dir = Files.createTempDirectory("repl-badca").toString
    val feed = new ReplicationFeed("127.0.0.1", server.port, "repl", "pw", 11L, dir,
      tlsMode = "verify_ca", tlsCa = Some(strangerPem.toString))
    try {
      feed.configure("mysql", None)
      val deadline = System.nanoTime() + 20e9.toLong
      while (feed.lastError == null && System.nanoTime() < deadline) Thread.sleep(20)
      assert(Option(feed.lastError).exists(e =>
        e.contains("PKIX") || e.toLowerCase.contains("certif")), feed.lastError)
      Thread.sleep(200)
      assert(feed.segments().map(feed.extent).sum == 0L,
        "no events may flow over an unverified channel")
    } finally { feed.close(); server.close() }
  }
}
