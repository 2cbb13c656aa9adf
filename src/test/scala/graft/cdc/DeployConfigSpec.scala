package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** The deployment artifact's config must actually drive the engine:
  * extract the embedded config.yaml from deploy/k8s/configmap.yaml (the
  * committed manifest itself, not a copy) and load it through
  * Config.load with the env the StatefulSet injects — shard identity,
  * source secrets, sink URL all land on the GraftConfig fields the
  * pipeline consumes. */
class DeployConfigSpec extends AnyFunSuite {

  private def embeddedYaml: String = {
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("deploy/k8s/configmap.yaml")), "UTF-8")
    val lines = manifest.linesIterator.toSeq
    val start = lines.indexWhere(_.trim == "config.yaml: |")
    require(start >= 0, "configmap must embed config.yaml")
    lines.drop(start + 1)
      .takeWhile(l => l.isEmpty || l.startsWith("    "))
      .map(_.stripPrefix("    "))
      .mkString("\n")
  }

  test("the shipped configmap loads with StatefulSet-injected env") {
    val f = java.nio.file.Files.createTempFile("graft-deploy", ".yaml")
    java.nio.file.Files.writeString(f, embeddedYaml)
    val env = Map(
      "GRAFT_SHARD_INDEX" -> "2",
      "GRAFT_SHARD_COUNT" -> "5",
      "MYSQL_HOST" -> "db.example",
      "MYSQL_USER" -> "repl",
      "MYSQL_PASSWORD" -> "s3cret",
      "SINK_URL" -> "http://sink/api/v1/data")
    val cfg = Config.load(f.toString, env)
    assert(cfg.serverId === "graft-2")
    assert(cfg.shardingEnabled)
    assert(cfg.shardCount === 5)
    assert(cfg.shardIndex === 2)
    assert(cfg.apiPort === 8080)
    assert(cfg.sourceHost === "db.example")
    assert(cfg.sourceUser === "repl")
    assert(cfg.sourcePassword === "s3cret")
    assert(cfg.dbTables === Map("shop" -> Seq("orders", "customers")))
    assert(cfg.routes.map(_.name) === Seq("orders-ops"))
    assert(cfg.connectors.exists(c =>
      c.connType == "webhook" && c.name == "webhook-upsert" &&
        c.url == "http://sink/api/v1/data"))
  }

  test("unset env expands empty, matching the reference's expandEnv") {
    assert(Config.expandEnv("id: ${ENV:NOPE}$-x", Map.empty) === "id: -x")
  }
}
