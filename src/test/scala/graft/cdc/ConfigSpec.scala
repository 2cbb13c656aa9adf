package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Config parsing + `${ENV:NAME}$` expansion parity (utils.go:28-39). */
class ConfigSpec extends AnyFunSuite {

  test("env expansion replaces refs; unset vars become empty") {
    val env = Map("DB_USER" -> "root", "DB_PASS" -> "s3cr3t")
    assert(Config.expandEnv("u=${ENV:DB_USER}$ p=${ENV:DB_PASS}$", env)
      == "u=root p=s3cr3t")
    assert(Config.expandEnv("x=${ENV:MISSING_VAR}$!", env) == "x=!")
    assert(Config.expandEnv("no refs here", env) == "no refs here")
  }

  test("parse full config json") {
    val cfg = Config.parse(
      """{
        |  "serverId": "srv-1",
        |  "itemByRow": false,
        |  "dbTables": {"testdb": ["users", "orders"]},
        |  "startFile": "mysql-bin.000002",
        |  "startPosition": 4,
        |  "shardingEnabled": true, "shardCount": 3, "shardIndex": 1,
        |  "shardKeyTemplate": "{{ (index .Data.Rows 0).id }}",
        |  "routes": [{"name": "r1", "connector": "c1",
        |              "operations": ["INSERT"], "dbTable": "testdb.users",
        |              "template": "{{ .Data.Operation }}"}]
        |}""".stripMargin)
    assert(cfg.serverId == "srv-1")
    assert(!cfg.itemByRow)
    assert(cfg.dbTables == Map("testdb" -> Seq("users", "orders")))
    assert(cfg.startFile.contains("mysql-bin.000002"))
    assert(cfg.shardCount == 3 && cfg.shardIndex == 1)
    assert(cfg.routes.head.operations == Seq("INSERT"))
  }

  test("defaults match the reference's shipped defaults") {
    val cfg = Config.parse("{}")
    assert(cfg.itemByRow && cfg.stopInError && !cfg.shardingEnabled)
    assert(cfg.shardCount == 1 && cfg.routes.isEmpty)
  }
}
