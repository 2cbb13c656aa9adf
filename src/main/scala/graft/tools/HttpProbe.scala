package graft.tools

import java.net.InetSocketAddress
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Spark-free microbench of the exact WebhookConnector delivery pattern:
  * N worker threads, each pushing `perWorker` POSTs through a shared
  * HttpClient with a 64-deep async in-flight window, against the same
  * com.sun.net.httpserver no-op sink CdcThroughput uses. Isolates raw
  * HTTP throughput (client + server + loopback) from the Spark pipeline.
  *
  * Usage: runMain graft.tools.HttpProbe [total] [workers]
  */
object HttpProbe {
  def main(args: Array[String]): Unit = {
    val total = args.lift(0).map(_.toInt).getOrElse(100000)
    val workers = args.lift(1).map(_.toInt).getOrElse(16)

    System.setProperty("sun.net.httpserver.nodelay", "true")
    val delivered = new AtomicLong(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 1024)
    val pool = Executors.newFixedThreadPool(32)
    server.setExecutor(pool)
    server.createContext("/sink", (x: HttpExchange) => {
      x.getRequestBody.readAllBytes()
      delivered.incrementAndGet()
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/sink"

    val client = HttpClient.newBuilder()
      .version(HttpClient.Version.HTTP_1_1)
      .connectTimeout(Duration.ofSeconds(10)).build()
    val payload = """{"itemID":"42","op":"INSERT","rows":[["42","user42","u42@example.com"]]}"""
      .getBytes("UTF-8")

    // ramp sampler: prints delivered count each second
    val sampler = new Thread(() => {
      val t0 = System.nanoTime()
      while (delivered.get() < total) {
        Thread.sleep(1000)
        System.err.println(f"[probe] t=${(System.nanoTime() - t0) / 1e9}%.1f delivered=${delivered.get()}")
      }
    })
    sampler.setDaemon(true)

    val perWorker = total / workers
    val t0 = System.nanoTime()
    sampler.start()
    val ws = (1 to workers).map { _ =>
      new Thread(() => {
        val inFlight = new java.util.ArrayDeque[java.util.concurrent.CompletableFuture[HttpResponse[String]]]()
        var i = 0
        while (i < perWorker) {
          val req = HttpRequest.newBuilder(URI.create(url))
            .timeout(Duration.ofSeconds(10))
            .method("POST", HttpRequest.BodyPublishers.ofByteArray(payload))
            .header("X-Idempotency-Key", s"k$i")
            .header("Content-Type", "application/json").build()
          while (inFlight.size >= 64) inFlight.poll().join()
          inFlight.add(client.sendAsync(req, HttpResponse.BodyHandlers.ofString()))
          i += 1
        }
        while (!inFlight.isEmpty) inFlight.poll().join()
      })
    }
    ws.foreach(_.start()); ws.foreach(_.join())
    val elapsed = (System.nanoTime() - t0) / 1e9
    // rate over DELIVERED, not attempted: a collapse (connect timeouts)
    // must read as a low number, not as throughput.
    println(f"""{"metric":"http_probe","value":${delivered.get() / elapsed}%.0f,"unit":"req/s","elapsed_sec":$elapsed%.2f,"delivered":${delivered.get()},"attempted":$total}""")
    server.stop(0); pool.shutdownNow(); sys.exit(0)
  }
}
