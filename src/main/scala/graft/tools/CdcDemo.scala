package graft.tools

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.cdc._
import scala.jdk.CollectionConverters._

/** Manual end-to-end drive of the CDC path against a REAL local HTTP
  * webhook: replay source → decode → route → template → WebhookConnector.
  * Usage: runMain graft.tools.CdcDemo <fixtureDir> <checkpointDir>
  * (writes its own fixtures into fixtureDir if empty). */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val fixtureDir = Paths.get(args(0))
    val ckpt = args(1)
    Files.createDirectories(fixtureDir)

    // fixtures: 2 binlog files, INSERT + UPDATE (with before images) + unwatched noise
    if (!Files.exists(fixtureDir.resolve("mysql-bin.000001.jsonl"))) {
      Files.writeString(fixtureDir.resolve("mysql-bin.000001.jsonl"),
        """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":120,"database":"testdb","table":"users","colNames":["id","name","email"],"rows":[["1","ada","ada@x.io"],["2","bob","bob@x.io"]]}
          |{"eventType":"GTIDEvent","binlogFile":"mysql-bin.000001","binlogPosition":180}
          |{"eventType":"UpdateRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":260,"database":"testdb","table":"users","colNames":["id","name","email"],"rows":[["1","ada","ada@x.io"],["1","ada.l","ada@new.io"]]}
          |{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":300,"database":"otherdb","table":"users","colNames":["id"],"rows":[["9"]]}""".stripMargin)
      Files.writeString(fixtureDir.resolve("mysql-bin.000002.jsonl"),
        """{"eventType":"DeleteRowsEventV2","binlogFile":"mysql-bin.000002","binlogPosition":44,"database":"testdb","table":"users","colNames":["id","name","email"],"rows":[["2","bob","bob@x.io"]]}""".stripMargin)
    }

    // real HTTP server capturing webhook deliveries
    val received = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/data", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
      received.add(x.getRequestHeaders.getFirst("X-Idempotency-Key") -> body)
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/data"
    println(s"[demo] webhook listening at $url")

    val spark = SparkSession.builder().master("local[4]")
      .appName("cdc-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // reference-shaped route config (README.md example, wildcard-enabled)
    val route = Route("testdb-users-operations", "webhook-upsert",
      Seq("INSERT", "UPDATE", "DELETE"), "testdb.users",
      """{"index":"testdb-users-v1","itemID":"{{ .ItemID }}","operation":"{{ .Data.Operation }}","rows":{{- .Data.Rows | toJson }}}""")
    val conns: Map[String, Connector] = Map("webhook-upsert" ->
      new WebhookConnector("webhook-upsert", url,
        headers = Map("Content-Type" -> "application/json")))

    val raw = spark.readStream.format("binlog-replay")
      .option("path", fixtureDir.toString)
      .option("maxEventsPerTrigger", "2").load()
    val q = Decode.decode(raw, Map("testdb" -> Seq("users")))
      .writeStream
      .foreachBatch(Connectors.forEachBatch(Seq(route), conns))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.stop()
    server.stop(0)

    println(s"[demo] webhook received ${received.size()} deliveries:")
    received.iterator().asScala.foreach { case (k, b) => println(s"[demo]   key=$k body=$b") }
  }
}
