package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import graft.SparkTestBase

/** A20 parity (serverapi.go:78-130): /healthz constant OK; /api/v1/server
  * returns id + live progress (batch id / input rows) captured from the
  * StreamingQueryListener. */
class ObservabilitySpec extends SparkTestBase {

  private def get(url: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("healthz and server status reflect a completed streaming query") {
    val obs = new ObservabilityServer("obs-test", "127.0.0.1")
    val port = obs.start()
    obs.attach(spark)
    try {
      val (hc, hb) = get(s"http://127.0.0.1:$port/healthz")
      assert(hc === 200 && hb === "OK")

      // drive one micro-batch through a replay pipeline
      val dir = Files.createTempDirectory("obs-fix")
      Files.writeString(dir.resolve("mysql-bin.000001.jsonl"),
        """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":120,"database":"d","table":"t","colNames":["id"],"rows":[["1"],["2"],["3"]]}""")
      CollectingConnector.clear()
      val cfg = GraftConfig(serverId = "obs-test",
        dbTables = Map("d" -> Seq("t")),
        routes = Seq(Route("r", "c", Seq("INSERT"), "d.t", "{{ .Data.Rows | toJson }}")),
        connectors = Seq(ConnectorConfig("c", "collect")))
      val ckpt = Files.createTempDirectory("obs-ckpt").toString
      CdcPipeline.sync(spark, cfg, dir.toString, ckpt).awaitTermination(60000)

      val (sc, sb) = get(s"http://127.0.0.1:$port/api/v1/server")
      assert(sc === 200)
      assert(sb.contains(""""id":"obs-test""""))
      assert(sb.contains(""""query":"graft-sync-obs-test""""))
      // numInputRows counts RAW source events (1 JSONL line), the pool-depth
      // analog; the 3-row fan-out happens in decode and shows up at the sink.
      val seen = (1 to 20).exists { _ =>
        val (_, b) = get(s"http://127.0.0.1:$port/api/v1/server")
        if (b.contains(""""numInputRows":1""")) true else { Thread.sleep(250); false }
      }
      assert(seen, s"listener never reported the batch: ${get(s"http://127.0.0.1:$port/api/v1/server")._2}")
      assert(CollectingConnector.drain("c").size === 3)
    } finally {
      obs.stop()
      spark.streams.removeListener(obs.listener)
    }
  }
}
