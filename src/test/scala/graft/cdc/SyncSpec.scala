package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import graft.{Sync, SparkTestBase}

/** End-to-end drive of the CLI entry point (the `binwatch sync --config`
  * analog, cmd/main.go:26-34): a config FILE on disk → Config.load (env
  * expansion included) → supervised pipeline + observability server.
  * Asserts delivered payloads on the collect connector and a live
  * /healthz + /api/v1/server while the server is still up. */
class SyncSpec extends SparkTestBase {

  private def writeFixtures(): String = {
    val dir = Files.createTempDirectory("sync-spec")
    Files.writeString(dir.resolve("mysql-bin.000001.jsonl"),
      """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":120,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["1","ada"],["2","bob"]]}
        |{"eventType":"DeleteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":340,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["2","bob"]]}""".stripMargin)
    dir.toString
  }

  test("config file -> graft.Sync.run -> deliveries + live observability API") {
    CollectingConnector.clear()
    val src = writeFixtures()
    val ckpt = Files.createTempDirectory("sync-spec-ckpt").toString
    val cfgFile = Files.createTempFile("sync-spec", ".json")
    Files.writeString(cfgFile,
      s"""{
         |  "serverId": "sync-e2e",
         |  "dbTables": {"testdb": ["users"]},
         |  "sourcePath": "$src",
         |  "checkpointDir": "$ckpt",
         |  "apiHost": "127.0.0.1",
         |  "connectors": [{"name": "sinkS", "type": "collect"}],
         |  "routes": [{
         |    "name": "users-all",
         |    "connector": "sinkS",
         |    "operations": ["INSERT", "DELETE"],
         |    "dbTable": "testdb.users",
         |    "template": "{\\"op\\":\\"{{ .Data.Operation }}\\",\\"rows\\":{{ .Data.Rows | toJson }}}"
         |  }]
         |}""".stripMargin)

    val cfg = Config.load(cfgFile.toString)
    assert(cfg.sourcePath === src && cfg.follow === false)
    val obs = Sync.run(spark, cfg) // blocks until AvailableNow drains
    try {
      val got = CollectingConnector.drain("sinkS")
      assert(got.size === 3) // 2 INSERT items + 1 DELETE
      assert(got.map(_._2).count(_.contains(""""op":"INSERT"""")) === 2)
      assert(got.map(_._2).count(_.contains(""""op":"DELETE"""")) === 1)
      assert(got.forall(_._1.startsWith("mysql-bin.000001/")))

      // observability still serving after the stream drained
      val port = {
        // /api/v1/server reports its own bound port; probe healthz first
        val client = HttpClient.newHttpClient()
        def get(path: String, p: Int): HttpResponse[String] =
          client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$p$path")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
        // find the bound port via the server object: start() returned it
        // inside run(); recover it from /api/v1/server on the obs server
        val bound = obs.boundPort
        assert(get("/healthz", bound).body() === "OK")
        val api = get("/api/v1/server", bound).body()
        assert(api.contains(""""id":"sync-e2e""""))
        assert(api.contains(""""query":"graft-sync-sync-e2e""""))
        bound
      }
      assert(port > 0)
    } finally obs.stop()
  }

  test("main rejects missing --config") {
    val e = intercept[RuntimeException](Sync.main(Array("--wrong", "x")))
    assert(e.getMessage.contains("usage"))
  }
}
