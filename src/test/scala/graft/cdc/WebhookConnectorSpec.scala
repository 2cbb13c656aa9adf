package graft.cdc

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer, HttpsConfigurator, HttpsServer}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** HTTP-level contract of the webhook connector, mirrored from the
  * reference (connectors.webhook.go:24-76): configured method, custom
  * headers, basic auth, any non-2xx status is an error — plus the
  * engine-side additions: idempotency key header, bounded async
  * pipelining with flush-before-commit, and one sync retry on a
  * connection-level failure. */
class WebhookConnectorSpec extends AnyFunSuite {

  private case class Recorded(method: String, headers: Map[String, String], body: String)

  private def withServer(status: Int = 200)(f: (String, ConcurrentLinkedQueue[Recorded]) => Unit): Unit = {
    val got = new ConcurrentLinkedQueue[Recorded]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
      got.add(Recorded(x.getRequestMethod,
        x.getRequestHeaders.entrySet().asScala
          .map(e => e.getKey -> e.getValue.get(0)).toMap, body))
      x.sendResponseHeaders(status, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hook", got)
    finally server.stop(0)
  }

  test("configured method, headers, basic auth, and idempotency key are sent") {
    withServer() { (url, got) =>
      val c = new WebhookConnector("w", url, method = "PUT",
        headers = Map("Content-Type" -> "application/json", "X-Custom" -> "v1"),
        basicAuth = Some(("user", "pass")))
      c.send("""{"a":1}""".getBytes("UTF-8"), "file/120/0")
      c.flush()
      val r = got.poll()
      assert(r.method === "PUT")
      assert(r.headers("Content-type") === "application/json")
      assert(r.headers("X-custom") === "v1")
      // base64("user:pass")
      assert(r.headers("Authorization") === "Basic dXNlcjpwYXNz")
      assert(r.headers("X-idempotency-key") === "file/120/0")
      assert(r.body === """{"a":1}""")
    }
  }

  test("non-2xx response is an error (connectors.webhook.go:71-73 parity)") {
    withServer(status = 500) { (url, _) =>
      val c = new WebhookConnector("w", url)
      c.send("x".getBytes, "k0")
      val e = intercept[RuntimeException](c.flush())
      assert(e.getMessage.contains("500"))
    }
  }

  test("pipelined sends all arrive and flush blocks until delivered") {
    withServer() { (url, got) =>
      val c = new WebhookConnector("w", url, maxInFlight = 8)
      (1 to 100).foreach(i => c.send(s"payload-$i".getBytes, s"k$i"))
      c.flush()
      assert(got.size === 100)
      assert(got.asScala.map(_.body).toSet === (1 to 100).map(i => s"payload-$i").toSet)
    }
  }

  test("maxInFlight=1 preserves total delivery order (README.md:38 parity)") {
    // the reference only guarantees ordering with a single sender
    // worker; our equivalent is a 1-deep in-flight window
    withServer() { (url, got) =>
      val c = new WebhookConnector("w", url, maxInFlight = 1)
      (1 to 50).foreach(i => c.send(s"p-$i".getBytes, s"k$i"))
      c.flush()
      assert(got.asScala.map(_.body).toSeq === (1 to 50).map(i => s"p-$i"))
    }
  }

  test("batchSize=N joins payloads into JSON-array requests with range keys") {
    withServer() { (url, got) =>
      val c = new WebhookConnector("w", url, batchSize = 3)
      (1 to 7).foreach(i => c.send(s"""{"i":$i}""".getBytes("UTF-8"), s"f/$i/0"))
      c.flush() // 7 events -> 2 full batches + 1 partial tail batch
      assert(got.size === 3)
      val byKey = got.asScala.map(r => r.headers("X-idempotency-key") -> r.body).toMap
      assert(byKey("f/1/0..f/3/0") === """[{"i":1},{"i":2},{"i":3}]""")
      assert(byKey("f/4/0..f/6/0") === """[{"i":4},{"i":5},{"i":6}]""")
      assert(byKey("f/7/0..f/7/0") === """[{"i":7}]""")
    }
  }

  test("batched delivery keeps the non-2xx error and flush-before-commit contract") {
    withServer(status = 503) { (url, _) =>
      val c = new WebhookConnector("w", url, batchSize = 10)
      (1 to 4).foreach(i => c.send("{}".getBytes, s"k$i"))
      // nothing has shipped yet (batch not full) — the failure must
      // still surface on flush, failing the task before the commit
      val e = intercept[RuntimeException](c.flush())
      assert(e.getMessage.contains("503"))
    }
  }

  test("batchSize=1 (default) stays per-event — reference parity unchanged") {
    withServer() { (url, got) =>
      val c = new WebhookConnector("w", url)
      (1 to 3).foreach(i => c.send(s"p$i".getBytes, s"k$i"))
      c.flush()
      assert(got.size === 3)
      assert(got.asScala.map(_.body).toSet === Set("p1", "p2", "p3"))
      assert(got.asScala.forall(!_.headers("X-idempotency-key").contains("..")))
    }
  }

  /** Self-signed HTTPS server (keytool-generated PKCS12, SAN=localhost)
    * — the endpoint shape tlsSkipVerify exists for. */
  private def withTlsServer(f: (String, ConcurrentLinkedQueue[Recorded]) => Unit): Unit = {
    val ks = java.nio.file.Files.createTempDirectory("wh-tls").resolve("ks.p12")
    val keytool = new ProcessBuilder(
      "keytool", "-genkeypair", "-alias", "wh", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1",
      "-keystore", ks.toString, "-storetype", "PKCS12", "-storepass", "changeit")
      .redirectErrorStream(true).start()
    assert(keytool.waitFor() == 0, "keytool failed")
    val keyStore = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(ks)
    try keyStore.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(keyStore, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val got = new ConcurrentLinkedQueue[Recorded]()
    val server = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(ctx))
    server.createContext("/hook", (x: HttpExchange) => {
      got.add(Recorded(x.getRequestMethod, Map.empty,
        new String(x.getRequestBody.readAllBytes(), "UTF-8")))
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    try f(s"https://localhost:${server.getAddress.getPort}/hook", got)
    finally server.stop(0)
  }

  test("tlsSkipVerify=true delivers to a self-signed HTTPS endpoint") {
    withTlsServer { (url, got) =>
      val c = new WebhookConnector("w", url, tlsSkipVerify = true)
      c.send("tls-payload".getBytes, "k1")
      c.flush()
      assert(got.size === 1 && got.poll().body === "tls-payload")
    }
  }

  test("default verification refuses the self-signed certificate") {
    withTlsServer { (url, got) =>
      val c = new WebhookConnector("w", url) // tlsSkipVerify = false
      val e = intercept[Exception] { c.send("x".getBytes, "k2"); c.flush() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
        s"expected an SSL failure, got $e")
      assert(got.isEmpty, "nothing may be delivered over an unverified channel")
    }
  }

  test("connection-level failure retries once synchronously (at-least-once)") {
    // a server that hard-closes the first connection attempt per request
    val failures = new AtomicInteger(0)
    val got = new ConcurrentLinkedQueue[Recorded]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (x: HttpExchange) => {
      if (failures.getAndIncrement() == 0) {
        x.close() // drop without responding -> client sees connection error
      } else {
        got.add(Recorded(x.getRequestMethod, Map.empty,
          new String(x.getRequestBody.readAllBytes(), "UTF-8")))
        x.sendResponseHeaders(200, 2)
        x.getResponseBody.write("ok".getBytes); x.close()
      }
    })
    server.start()
    try {
      val c = new WebhookConnector("w", s"http://127.0.0.1:${server.getAddress.getPort}/hook")
      c.send("once".getBytes, "k")
      c.flush() // first attempt dropped; retry must deliver
      assert(got.size === 1 && got.poll().body === "once")
    } finally server.stop(0)
  }
}
