package graft.tools

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.cdc._

/** CDC-path throughput benchmark (BASELINE.md: ≥ 5,000 events/s sustained
  * through source → decode → route → template → no-op HTTP sink).
  *
  * Generates a synthetic change stream as replay fixtures (nFiles binlog
  * files so the micro-batch fans out to nFiles partitions), stands up a
  * real local HTTP server that 200-OKs every delivery, and drives the full
  * pipeline with Trigger.AvailableNow. Prints ONE JSON line:
  * {"metric":"cdc_throughput","value":<events/s>,"unit":"events/s",...}
  *
  * Usage: runMain graft.tools.CdcThroughput [numEvents] [numFiles]
  */
object CdcThroughput {
  def main(args: Array[String]): Unit = {
    val nEvents = args.lift(0).map(_.toInt).getOrElse(100000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val dir = Files.createTempDirectory("cdc-throughput")
    val perFile = (nEvents + nFiles - 1) / nFiles
    var written = 0
    (1 to nFiles).foreach { f =>
      val w = Files.newBufferedWriter(dir.resolve(f"mysql-bin.$f%06d.jsonl"))
      var i = 0
      while (i < perFile && written < nEvents) {
        val id = written
        w.write(s"""{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.$f%06d","binlogPosition":${120 + i * 40},"database":"testdb","table":"users","colNames":["id","name","email"],"rows":[["$id","user$id","u$id@example.com"]]}""")
        w.newLine(); i += 1; written += 1
      }
      w.close()
    }

    // no-op HTTP sink: counts deliveries, multi-threaded accept.
    // nodelay is essential: without it com.sun.net.httpserver leaves
    // Nagle on and every small keep-alive response eats a ~40 ms
    // delayed-ACK stall, capping the pipeline at ~25 req/s/conn.
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val delivered = new AtomicLong(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 1024)
    val pool = Executors.newFixedThreadPool(cpus.toInt)
    server.setExecutor(pool)
    server.createContext("/sink", (x: HttpExchange) => {
      x.getRequestBody.readAllBytes()
      delivered.incrementAndGet()
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/sink"

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-cdc-throughput")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val route = Route("users-all", "sink", Seq("INSERT", "UPDATE", "DELETE"),
      "testdb.users",
      """{"itemID":"{{ .ItemID }}","op":"{{ .Data.Operation }}","rows":{{- .Data.Rows | toJson }}}""")
    val conns: Map[String, Connector] =
      Map("sink" -> new WebhookConnector("sink", url,
        headers = Map("Content-Type" -> "application/json")))

    val ckpt = Files.createTempDirectory("cdc-throughput-ckpt").toString
    val t0 = System.nanoTime()
    // sys.exit in finally: the HTTP pool's non-daemon threads (and any
    // failure path that skips cleanup) must never leave a hung JVM behind.
    var finished = false
    try {
      val q = Decode.decode(
          spark.readStream.format("binlog-replay")
            .option("path", dir.toString).load(),
          Map("testdb" -> Seq("users")))
        .writeStream
        .foreachBatch(Connectors.forEachBatch(Seq(route), conns))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      finished = q.awaitTermination(600000)
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (!finished) System.err.println(s"[cdc-bench] TIMED OUT after $elapsed s with ${delivered.get()} delivered")
      val eps = delivered.get() / elapsed
      println(f"""{"metric":"cdc_throughput","value":$eps%.0f,"unit":"events/s","events":${delivered.get()},"elapsed_sec":$elapsed%.2f,"target":5000}""")
    } catch {
      case e: Throwable =>
        System.err.println(s"[cdc-bench] FAILED after ${(System.nanoTime() - t0) / 1e9} s with ${delivered.get()} delivered: $e")
    } finally {
      server.stop(0)
      pool.shutdownNow()
      try spark.stop() catch { case _: Throwable => () }
      sys.exit(if (finished) 0 else 1)
    }
  }
}
