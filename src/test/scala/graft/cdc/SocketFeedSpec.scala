package graft.cdc

import java.io.OutputStreamWriter
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import graft.SparkTestBase
import graft.cdc.source.{ReplayFeed, SpoolingSocketFeed}

/** Live-transport feed: events arriving over TCP are spooled to segment
  * files and flow through the UNCHANGED DSv2 offset/decode machinery —
  * the concrete demonstration that a live client is a drop-in second
  * EventFeed implementation (A1 seam). */
class SocketFeedSpec extends SparkTestBase {

  private def event(pos: Long, id: Long): String =
    s"""{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":$pos,"database":"testdb","table":"users","colNames":["id"],"rows":[["$id"]]}"""

  /** One-connection server that writes `lines` then keeps the socket
    * open (a live tail never EOFs). */
  private def withServer(lines: Seq[String])(f: Int => Unit): Unit = {
    val server = new ServerSocket(0, 2, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
        lines.foreach { l => w.write(l); w.write("\n") }
        w.flush()
        Thread.sleep(600000) // hold the connection open
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try f(server.getLocalPort) finally server.close()
  }

  private def awaitSpool(dir: String, n: Long): Unit = {
    val replay = new ReplayFeed(dir)
    val deadline = System.nanoTime() + 30e9.toLong
    while (replay.segments().map(replay.extent).sum < n) {
      assert(System.nanoTime() < deadline, "spool did not fill in time")
      Thread.sleep(50)
    }
  }

  test("socket feed spools with rotation and serves the EventFeed contract") {
    val lines = (1 to 25).map(i => event(i * 10L, i.toLong))
    withServer(lines) { port =>
      val dir = Files.createTempDirectory("socket-feed").toString
      val feed = new SpoolingSocketFeed("127.0.0.1", port, dir, rotateEvery = 10L)
      try {
        awaitSpool(dir, 25)
        val segs = feed.segments()
        assert(segs.size === 3) // 10 + 10 + 5 with rotateEvery=10
        assert(segs.map(feed.extent).sum === 25L)
        val r = feed.open(segs.head, 2, 5)
        val got = Iterator.continually(r).takeWhile(_.next()).map(_.get().binlogPosition).toSeq
        r.close()
        assert(got === Seq(30L, 40L, 50L)) // events [2,5) of segment 0
      } finally feed.close()
    }
  }

  test("partial line on disconnect is discarded; feed reconnects and resumes") {
    // first connection: one full event + a torn half-event, then close;
    // second connection: two more full events
    val server = new ServerSocket(0, 2, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val s1 = server.accept()
        val w1 = new OutputStreamWriter(s1.getOutputStream, StandardCharsets.UTF_8)
        w1.write(event(10, 1) + "\n")
        w1.write(event(20, 2).take(40)) // torn mid-line
        w1.flush(); s1.close()
        val s2 = server.accept()
        val w2 = new OutputStreamWriter(s2.getOutputStream, StandardCharsets.UTF_8)
        w2.write(event(20, 2) + "\n"); w2.write(event(30, 3) + "\n")
        w2.flush()
        Thread.sleep(600000)
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    val dir = Files.createTempDirectory("socket-reconnect").toString
    val feed = new SpoolingSocketFeed("127.0.0.1", server.getLocalPort, dir)
    try {
      awaitSpool(dir, 3)
      // every spooled line is complete, parseable JSON
      val all = feed.segments().flatMap { seg =>
        val r = feed.open(seg, 0, Long.MaxValue)
        val evs = Iterator.continually(r).takeWhile(_.next()).map(_.get()).toSeq
        r.close(); evs
      }
      assert(all.map(_.binlogPosition) === Seq(10L, 20L, 30L))
      // reconnect started a fresh segment — closed segments never regrow
      assert(feed.segments().size === 2)
    } finally { feed.close(); server.close() }
  }

  test("live socket events flow through the unchanged DSv2 source + decode") {
    val lines = (1 to 12).map(i => event(i * 100L, i.toLong))
    withServer(lines) { port =>
      val dir = Files.createTempDirectory("socket-dsv2").toString
      val ckpt = Files.createTempDirectory("socket-dsv2-ckpt").toString
      awaitFeed(dir, port, 12)
      val raw = spark.readStream.format("binlog-replay")
        .option("path", dir)
        .option("socket", s"127.0.0.1:$port")
        .option("spoolRotate", "5")
        .load()
      val q = Decode.decode(raw, Map("testdb" -> Seq("users")))
        .writeStream.format("memory").queryName("socket_e2e")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val ids = spark.sql("SELECT data.rows[0]['id'] FROM socket_e2e")
        .collect().map(_.getString(0)).map(_.toLong).sorted
      assert(ids.toSeq === (1L to 12L))
    }
  }

  test("socketSource config wires TCP tail through the full sync pipeline") {
    CollectingConnector.clear()
    val lines = (1 to 6).map(i => event(i * 100L, i.toLong))
    withServer(lines) { port =>
      val dir = Files.createTempDirectory("socket-sync").toString
      awaitFeed(dir, port, 6)
      val cfg = Config.parse(
        s"""{"serverId": "sock1", "dbTables": {"testdb": ["users"]},
           |  "sourcePath": "$dir", "socketSource": "127.0.0.1:$port",
           |  "connectors": [{"name": "sinkT", "type": "collect"}],
           |  "routes": [{"name": "r", "connector": "sinkT",
           |    "operations": ["INSERT"], "dbTable": "testdb.users",
           |    "template": "{{ .Data.Rows | toJson }}"}]}""".stripMargin)
      val ckpt = Files.createTempDirectory("socket-sync-ckpt").toString
      val q = CdcPipeline.sync(spark, cfg, cfg.sourcePath, ckpt)
      q.awaitTermination(60000)
      assert(CollectingConnector.drain("sinkT").size === 6)
    }
  }

  /** Pre-warm the registry feed so the spool holds all events before the
    * AvailableNow cap freezes (the cap snapshots extents at prepare). */
  private def awaitFeed(dir: String, port: Int, n: Long): Unit = {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("socket", s"127.0.0.1:$port", "spoolRotate", "5"))
    graft.cdc.source.BinlogFeeds.forOptions(dir, opts)
    awaitSpool(dir, n)
  }
}
