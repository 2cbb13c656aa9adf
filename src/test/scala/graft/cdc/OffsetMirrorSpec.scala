package graft.cdc

import java.io.{DataInputStream, BufferedInputStream, BufferedOutputStream}
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import graft.SparkTestBase

/** Offset-mirror parity with the reference's checkpoint stores
  * (cache.local.go / cache.redis.go): key `binwatch.<id>.cache`, value
  * `<file>/<position>`, whitespace/shape/uint32 validation on load,
  * missing key = no location. The Redis path speaks real RESP2 against
  * an in-process stub server (no client library vendored). */
class OffsetMirrorSpec extends SparkTestBase {

  /** Minimal RESP2 server: AUTH/SET/GET over one connection at a time. */
  private final class FakeRedis(password: Option[String] = None) extends AutoCloseable {
    private val server = new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
    val commands = new ConcurrentLinkedQueue[Seq[String]]()
    val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def port: Int = server.getLocalPort

    private val thread = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new BufferedOutputStream(sock.getOutputStream)
        def line(): String = {
          val sb = new java.lang.StringBuilder
          var c = in.read()
          while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
          in.read(); sb.toString
        }
        def reply(s: String): Unit = { out.write(s.getBytes(StandardCharsets.UTF_8)); out.flush() }
        try while (true) {
          val first = in.read()
          if (first == -1) throw new java.io.EOFException
          assert(first == '*')
          val n = line().toInt
          val args = (0 until n).map { _ =>
            assert(in.read() == '$')
            val len = line().toInt
            val buf = new Array[Byte](len)
            in.readFully(buf); line()
            new String(buf, StandardCharsets.UTF_8)
          }
          commands.add(args)
          args.head.toUpperCase match {
            case "AUTH" =>
              if (password.contains(args(1))) reply("+OK\r\n")
              else reply("-ERR invalid password\r\n")
            case "SET" => store.put(args(1), args(2)); reply("+OK\r\n")
            case "GET" => Option(store.get(args(1))) match {
              case Some(v) =>
                val b = v.getBytes(StandardCharsets.UTF_8)
                reply(s"$$${b.length}\r\n$v\r\n")
              case None => reply("$-1\r\n")
            }
            case _ => reply("-ERR unknown command\r\n")
          }
        } catch { case _: Throwable => () } finally sock.close()
      } catch { case _: Throwable => () }
    })
    thread.setDaemon(true); thread.start()
    override def close(): Unit = server.close()
  }

  test("location parse: reference validation rules") {
    assert(OffsetMirror.parseLocation("") === Right(None))
    assert(OffsetMirror.parseLocation("mysql-bin.000001/42")
      === Right(Some(("mysql-bin.000001", 42L))))
    assert(OffsetMirror.parseLocation("a b/42").isLeft)   // whitespace
    assert(OffsetMirror.parseLocation("a/b/42").isLeft)   // two '/'
    assert(OffsetMirror.parseLocation("a/notanum").isLeft)
    assert(OffsetMirror.parseLocation("a/4294967296").isLeft) // > uint32
  }

  test("local mirror round-trips through binwatch.<id>.cache file") {
    val dir = Files.createTempDirectory("mirror").toString
    val m = new LocalOffsetMirror(dir, "srv1")
    assert(m.load() === None) // fresh empty file
    m.store("mysql-bin.000002", 4321L)
    assert(m.load() === Some(("mysql-bin.000002", 4321L)))
    assert(Files.readString(java.nio.file.Paths.get(dir, "binwatch.srv1.cache"))
      === "mysql-bin.000002/4321")
  }

  test("redis mirror: SET/GET with reference key, missing key = None") {
    val srv = new FakeRedis()
    try {
      val m = new RedisOffsetMirror(new RespClient("127.0.0.1", srv.port), "srv9")
      assert(m.load() === None)
      m.store("mysql-bin.000007", 120L)
      assert(srv.store.get("binwatch.srv9.cache") === "mysql-bin.000007/120")
      assert(m.load() === Some(("mysql-bin.000007", 120L)))
      m.close()
    } finally srv.close()
  }

  test("redis mirror authenticates when a password is configured") {
    val srv = new FakeRedis(password = Some("s3cret"))
    try {
      val m = new RedisOffsetMirror(
        new RespClient("127.0.0.1", srv.port, Some("s3cret")), "srvA")
      m.store("f", 1L)
      assert(srv.commands.asScala.head === Seq("AUTH", "s3cret"))
      m.close()
      intercept[RuntimeException] {
        new RespClient("127.0.0.1", srv.port, Some("wrong"))
      }
    } finally srv.close()
  }

  test("sync pipeline mirrors the delivered batch-max offset (store-after-send)") {
    CollectingConnector.clear()
    val srv = new FakeRedis()
    try {
      val dir = Files.createTempDirectory("mirror-sync")
      Files.writeString(dir.resolve("mysql-bin.000001.jsonl"),
        """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":120,"database":"testdb","table":"users","colNames":["id"],"rows":[["1"]]}
          |{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":340,"database":"testdb","table":"users","colNames":["id"],"rows":[["2"]]}""".stripMargin)
      val cfg = Config.parse(
        s"""{"serverId": "m1", "dbTables": {"testdb": ["users"]},
           |  "cacheType": "redis", "redisHost": "127.0.0.1", "redisPort": ${srv.port},
           |  "connectors": [{"name": "sinkM", "type": "collect"}],
           |  "routes": [{"name": "r", "connector": "sinkM",
           |    "operations": ["INSERT"], "dbTable": "testdb.users",
           |    "template": "{{ .Data.Rows | toJson }}"}]}""".stripMargin)
      val ckpt = Files.createTempDirectory("mirror-sync-ckpt").toString
      val q = CdcPipeline.sync(spark, cfg, dir.toString, ckpt)
      q.awaitTermination(60000)
      assert(CollectingConnector.drain("sinkM").size === 2)
      assert(srv.store.get("binwatch.m1.cache") === "mysql-bin.000001/340")
    } finally srv.close()
  }
}
