package graft.cdc

import java.net.InetSocketAddress
import java.util.Base64
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** HTTP-level contract of the Pub/Sub connector, mirrored from the
  * reference (connectors.pubsub.go:19-42): Send is a blocking publish of
  * one message to projects/{project}/topics/{topic}, success requires the
  * service's messageId ack (result.Get parity), any failure is the Send
  * error. Emulator-style local stub speaks the public REST publish shape. */
class PubSubConnectorSpec extends AnyFunSuite {

  private case class Published(path: String, auth: Option[String], body: String)

  private def withStub(status: Int = 200, ackBody: String = """{"messageIds":["101"]}""")(
      f: (String, ConcurrentLinkedQueue[Published]) => Unit): Unit = {
    val got = new ConcurrentLinkedQueue[Published]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      got.add(Published(x.getRequestURI.getPath,
        Option(x.getRequestHeaders.getFirst("Authorization")),
        new String(x.getRequestBody.readAllBytes(), "UTF-8")))
      val b = ackBody.getBytes("UTF-8")
      x.sendResponseHeaders(status, b.length)
      x.getResponseBody.write(b); x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", got)
    finally server.stop(0)
  }

  test("publishes to the topic path with base64 data and idempotency attribute") {
    withStub() { (endpoint, got) =>
      val c = new PubSubConnector("ps", "proj-1", "topic-a", endpoint)
      c.send("""{"op":"INSERT"}""".getBytes("UTF-8"), "mysql-bin.000001/120/0")
      val p = got.poll()
      assert(p.path === "/v1/projects/proj-1/topics/topic-a:publish")
      val data = Base64.getEncoder.encodeToString("""{"op":"INSERT"}""".getBytes("UTF-8"))
      assert(p.body.contains(s""""data":"$data""""))
      assert(p.body.contains(""""idempotencyKey":"mysql-bin.000001/120/0""""))
      assert(p.auth.isEmpty)
    }
  }

  test("bearer token is attached when configured") {
    withStub() { (endpoint, got) =>
      val c = new PubSubConnector("ps", "p", "t", endpoint, authToken = Some("tok-123"))
      c.send("x".getBytes, "k")
      assert(got.poll().auth === Some("Bearer tok-123"))
    }
  }

  test("non-2xx publish is a Send error (pubsub.go:36-41 parity)") {
    withStub(status = 503, ackBody = """{"error":"unavailable"}""") { (endpoint, _) =>
      val c = new PubSubConnector("ps", "p", "t", endpoint)
      val e = intercept[RuntimeException](c.send("x".getBytes, "k"))
      assert(e.getMessage.contains("google pubsub"))
      assert(e.getMessage.contains("503"))
    }
  }

  test("2xx without a messageIds ack is still a Send error (result.Get parity)") {
    withStub(ackBody = """{}""") { (endpoint, _) =>
      val c = new PubSubConnector("ps", "p", "t", endpoint)
      val e = intercept[RuntimeException](c.send("x".getBytes, "k"))
      assert(e.getMessage.contains("no messageIds ack"))
    }
  }

  test("factory builds it from config (connectors.go:23-26 parity)") {
    withStub() { (endpoint, got) =>
      val cfg = Config.parse(
        s"""{"connectors":[{"name":"ps","type":"google_pubsub",
           |  "projectId":"proj-9","topicId":"events","url":"$endpoint",
           |  "authToken":"t0"}]}""".stripMargin)
      val conns = CdcPipeline.buildConnectors(cfg)
      conns("ps").send("hello".getBytes, "k1")
      val p = got.poll()
      assert(p.path === "/v1/projects/proj-9/topics/events:publish")
      assert(p.auth === Some("Bearer t0"))
    }
  }

  test("unknown connector type still rejected") {
    val cfg = Config.parse("""{"connectors":[{"name":"x","type":"kafka"}]}""")
    val e = intercept[RuntimeException](CdcPipeline.buildConnectors(cfg))
    assert(e.getMessage.contains("unsupported"))
  }
}
