package graft.cdc

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Observability API (A20) — parity with the reference's HTTP server
  * (/root/reference/internal/binwatch/serverapi/serverapi.go:21-23,78-130):
  * `GET /healthz` → "OK"; `GET /api/v1/server` → id/host/port + live depth.
  * The "pool depth" analog in Spark is the last micro-batch's input row
  * count, captured via StreamingQueryListener (no polling, no reflection).
  */
final class ObservabilityServer(serverId: String, host: String = "0.0.0.0",
    port: Int = 0) {

  private case class Snapshot(queryName: String, batchId: Long,
      numInputRows: Long, inputRowsPerSecond: Double, status: String)

  private val last = new AtomicReference[Snapshot](
    Snapshot("", -1L, 0L, 0.0, "starting"))

  /** Register on a session: spark.streams.addListener(obs.listener) */
  val listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      last.set(Snapshot(Option(e.name).getOrElse(""), -1L, 0L, 0.0, "running"))
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      last.set(Snapshot(Option(e.progress.name).getOrElse(""), e.progress.batchId,
        e.progress.numInputRows, e.progress.inputRowsPerSecond, "running"))
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      val s = last.get
      last.set(s.copy(status = e.exception.map(x => s"failed: $x").getOrElse("stopped")))
    }
  }

  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/healthz", (x: HttpExchange) => respond(x, 200, "OK"))
    server.createContext("/api/v1/server", (x: HttpExchange) => {
      val s = last.get
      respond(x, 200,
        s"""{"id":"$serverId","host":"$host","port":${server.getAddress.getPort},""" +
          s""""query":"${s.queryName}","batchId":${s.batchId},""" +
          s""""numInputRows":${s.numInputRows},"inputRowsPerSecond":${s.inputRowsPerSecond},""" +
          s""""status":"${s.status.replace("\"", "'")}"}""")
    })
    server.start()
    server.getAddress.getPort
  }

  def attach(spark: SparkSession): Unit = spark.streams.addListener(listener)

  /** Bound port after start() (0 before). */
  def boundPort: Int = if (server == null) 0 else server.getAddress.getPort

  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }
}

/** Restart supervisor (A19) — parity with restartSyncerOnError
  * (blreaderwork.go:150-190): run a streaming pipeline, restart it from
  * its checkpoint on failure up to maxRestarts; stopInError=false ≙
  * unlimited restarts. */
object RestartSupervisor {
  def run(maxRestarts: Int)(startQuery: () => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    var attempts = 0
    var done = false
    var backoffMs = 100L
    while (!done) {
      val q = startQuery()
      try { q.awaitTermination(); done = true; backoffMs = 100L }
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          attempts += 1
          if (maxRestarts >= 0 && attempts > maxRestarts) throw e
          // a persistently failing source (e.g. a stopped replication
          // tail) must not spin a zero-delay restart hot loop
          try Thread.sleep(backoffMs) catch { case _: InterruptedException => () }
          backoffMs = math.min(backoffMs * 2, 10000L)
      }
    }
  }
}
