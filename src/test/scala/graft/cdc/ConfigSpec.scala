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

  test("Go duration strings parse to milliseconds") {
    assert(Config.parseGoDuration("90s") == 90000L)
    assert(Config.parseGoDuration("1m30s") == 90000L)
    assert(Config.parseGoDuration("500ms") == 500L)
    assert(Config.parseGoDuration("2h") == 7200000L)
    assert(Config.parseGoDuration("60000000000") == 60000L) // bare = ns (Go)
    assert(Config.parseGoDuration("1.5s") == 1500L) // Go grammar: fractions
    assert(Config.parseGoDuration("0.5h") == 1800000L)
    intercept[IllegalArgumentException](Config.parseGoDuration("12-34"))
    intercept[IllegalArgumentException](Config.parseGoDuration("ninety seconds"))
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
        |  "sourceTlsMode": "verify_identity",
        |  "sourceTlsCa": "/etc/certs/flat-ca.pem",
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
    // the flat layout maps TLS source options too (ADVICE r5: a user
    // setting verify_identity here must not silently run plaintext)
    assert(cfg.sourceTlsMode == "verify_identity")
    assert(cfg.sourceTlsCa == "/etc/certs/flat-ca.pem")
  }

  test("reference-layout YAML config is a drop-in (binwatch.v1alpha2 shape)") {
    val yaml =
      """logger:
        |  level: debug
        |server:
        |  id: drop-in-id
        |  host: "127.0.0.1"
        |  port: 8080
        |  stopInError: false
        |  senderWorkers: 1
        |  pool:
        |    size: 20
        |    itemByRow: true
        |  cache:
        |    enabled: true
        |    type: redis
        |    local:
        |      path: /tmp/cache
        |    redis:
        |      host: "10.0.0.5"
        |      port: 6380
        |      password: "${ENV:GRAFT_TEST_REDIS_PW}$"
        |source:
        |  flavor: mysql
        |  serverID: 100
        |  host: "127.0.0.1"
        |  port: 3306
        |  readTimeout: 90s
        |  heartbeatPeriod: 1m30s
        |  tlsMode: verify_ca
        |  tlsCa: /etc/certs/ca.pem
        |  dbTables:
        |    testdb: [users, orders]
        |  startLocation:
        |    file: "mysql-bin.000007"
        |    position: 4
        |sharding:
        |  enabled: true
        |  count: 3
        |  index: 1
        |  keyTemplate: '{{ (index .Data.Rows 0).id }}'
        |connectors:
        |- name: hook-a
        |  type: webhook
        |  webhook:
        |    url: http://127.0.0.1:8085/api/v1/data
        |    method: PUT
        |    batchSize: 4
        |    headers:
        |      "Content-Type": "application/json"
        |    credentials:
        |      username: u1
        |      password: p1
        |- name: ps-a
        |  type: google_pubsub
        |  pubsub:
        |    projectID: proj-x
        |    topicID: topic-y
        |routes:
        |- name: users-route
        |  connector: hook-a
        |  operations: ["INSERT", "UPDATE"]
        |  dbTable: "testdb.users"
        |  template: |
        |    {"op":"{{ .Data.Operation }}"}
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("ref-config", ".yaml")
    java.nio.file.Files.writeString(f, yaml)
    val cfg = Config.load(f.toString, env = Map("GRAFT_TEST_REDIS_PW" -> "sekrit"))
    assert(cfg.serverId === "drop-in-id")
    assert(cfg.apiHost === "127.0.0.1" && cfg.apiPort === 8080)
    assert(cfg.stopInError === false && cfg.itemByRow === true)
    assert(cfg.dbTables === Map("testdb" -> Seq("users", "orders")))
    assert(cfg.startFile === Some("mysql-bin.000007") && cfg.startPosition === Some(4L))
    assert(cfg.startFlavor === "mysql" && cfg.startGtid === None)
    assert(cfg.sourceServerId === 100L)
    assert(cfg.sourceTlsMode === "verify_ca" && cfg.sourceTlsCa === "/etc/certs/ca.pem")
    assert(cfg.loggerLevel === "debug")
    assert(cfg.readTimeoutMs === 90000L && cfg.heartbeatPeriodMs === 90000L)
    assert(!cfg.restartSyncerOnError) // absent → the reference's false
    assert(cfg.poolSize === 20L) // server.pool.size → admission cap
    // server.senderWorkers: 1 (ordered delivery) → sink in-flight window 1
    assert(cfg.connectors.forall(_.maxInFlight === 1))
    assert(cfg.shardingEnabled && cfg.shardCount === 3 && cfg.shardIndex === 1)
    assert(cfg.shardKeyTemplate === Some("{{ (index .Data.Rows 0).id }}"))
    assert(cfg.cacheType === "redis" && cfg.redisHost === "10.0.0.5"
      && cfg.redisPort === 6380 && cfg.redisPassword === Some("sekrit"))
    val hook = cfg.connectors.find(_.name == "hook-a").get
    assert(hook.connType === "webhook" && hook.url.endsWith("/api/v1/data")
      && hook.method === "PUT"
      && hook.basicAuthUser === Some("u1") && hook.basicAuthPass === Some("p1"))
    assert(hook.batchSize === 4) // engine-extension key under webhook:
    val ps = cfg.connectors.find(_.name == "ps-a").get
    assert(ps.connType === "google_pubsub"
      && ps.projectId === "proj-x" && ps.topicId === "topic-y")
    assert(cfg.routes.head.dbTable === "testdb.users")
    assert(cfg.routes.head.template.contains("""{"op":"{{ .Data.Operation }}"}"""))
    // cache disabled -> no mirror regardless of type fields
    val off = Config.load({
      val g = java.nio.file.Files.createTempFile("ref-config-off", ".yaml")
      java.nio.file.Files.writeString(g,
        yaml.replace("enabled: true\n    type: redis", "enabled: false\n    type: redis"))
      g.toString
    }, env = Map.empty)
    assert(off.cacheType === "")
  }

  test("defaults match the reference's shipped defaults") {
    val cfg = Config.parse("{}")
    assert(cfg.itemByRow && cfg.stopInError && !cfg.shardingEnabled)
    assert(cfg.shardCount == 1 && cfg.routes.isEmpty)
    assert(cfg.startFlavor == "mysql" && cfg.startGtid.isEmpty
      && cfg.sourceFormat == "jsonl")
  }

  test("flat layout: webhook batchSize opt-in, per-event default") {
    val cfg = Config.parse(
      """{"serverId":"b1","connectors":[
        |  {"name":"w16","type":"webhook","url":"http://h/","batchSize":16},
        |  {"name":"w1","type":"webhook","url":"http://h/"}]}""".stripMargin)
    assert(cfg.connectors.find(_.name == "w16").get.batchSize === 16)
    assert(cfg.connectors.find(_.name == "w1").get.batchSize === 1)
  }

  test("batchSize <= 0 is refused loudly, not silently clamped") {
    val e = intercept[IllegalArgumentException](Config.parse(
      """{"serverId":"b2","connectors":[
        |  {"name":"w","type":"webhook","url":"http://h/","batchSize":0}]}""".stripMargin))
    assert(e.getMessage.contains("batchSize"), e.getMessage)
  }

  test("mariadb flavor + GTID start position from the nested layout") {
    val yaml =
      """source:
        |  flavor: mariadb
        |  dbTables:
        |    testdb: [users]
        |  startLocation:
        |    gtid: "0-1-5"
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("ref-config-maria", ".yaml")
    java.nio.file.Files.writeString(f, yaml)
    val cfg = Config.load(f.toString, env = Map.empty)
    assert(cfg.startFlavor === "mariadb")
    assert(cfg.startGtid === Some("0-1-5"))
    // an unknown flavor is a config error, not a silent default
    val g = java.nio.file.Files.createTempFile("ref-config-bad", ".yaml")
    java.nio.file.Files.writeString(g, "source:\n  flavor: postgres\n")
    intercept[IllegalArgumentException](Config.load(g.toString, env = Map.empty))
  }

  test("flavor and GTID hints reach the feed through the seam") {
    import graft.cdc.source.{BinlogFeeds, EventFeed}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new java.util.HashMap[String, String]()
    opts.put("flavor", "mariadb")
    opts.put("startingGtid", "0-1-5")
    // file feeds: documented no-op, but the call must flow through
    val feed: EventFeed = BinlogFeeds.forOptions(
      java.nio.file.Files.createTempDirectory("flv").toString,
      new CaseInsensitiveStringMap(opts))
    assert(feed.segments().isEmpty) // feed constructed + configured fine
  }
}
