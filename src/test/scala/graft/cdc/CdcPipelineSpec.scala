package graft.cdc

import java.nio.file.Files
import graft.SparkTestBase

/** End-to-end config-driven sync (the `binwatch sync --config` analog):
  * a JSON config with routes + connectors becomes a running checkpointed
  * pipeline; deliveries land on the configured connector with rendered
  * payloads and idempotency keys. */
class CdcPipelineSpec extends SparkTestBase {

  private def writeFixtures(): String = {
    val dir = Files.createTempDirectory("cdc-pipe")
    Files.writeString(dir.resolve("mysql-bin.000001.jsonl"),
      """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":120,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["1","ada"],["2","bob"]]}
        |{"eventType":"UpdateRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":260,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["1","ada"],["1","ada2"]]}
        |{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":300,"database":"otherdb","table":"users","colNames":["id"],"rows":[["9"]]}
        |{"eventType":"DeleteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":340,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["2","bob"]]}""".stripMargin)
    dir.toString
  }

  test("config JSON -> sync pipeline -> connector deliveries") {
    CollectingConnector.clear()
    val cfg = Config.parse(
      """{
        |  "serverId": "t1",
        |  "itemByRow": true,
        |  "dbTables": {"testdb": ["users"]},
        |  "connectors": [{"name": "sinkA", "type": "collect"}],
        |  "routes": [{
        |    "name": "users-writes",
        |    "connector": "sinkA",
        |    "operations": ["INSERT", "UPDATE"],
        |    "dbTable": "testdb.users",
        |    "template": "{\"op\":\"{{ .Data.Operation }}\",\"rows\":{{ .Data.Rows | toJson }}}"
        |  }]
        |}""".stripMargin)
    assert(cfg.connectors.head.connType === "collect")

    val ckpt = Files.createTempDirectory("cdc-pipe-ckpt").toString
    val q = CdcPipeline.sync(spark, cfg, writeFixtures(), ckpt)
    q.awaitTermination(60000)

    val got = CollectingConnector.drain("sinkA")
    // INSERT carries 2 rows (itemByRow -> 2 items), UPDATE keeps only the
    // after-image (1 item); DELETE is not routed; otherdb is unwatched.
    assert(got.size === 3)
    val payloads = got.map(_._2).sorted
    assert(payloads.exists(_.contains(""""op":"INSERT"""")))
    assert(payloads.exists(_.contains(""""name":"ada2"""")))
    assert(!payloads.exists(_.contains("DELETE")))
    // idempotency keys carry (file, position, rowIdx)
    assert(got.forall(_._1.startsWith("mysql-bin.000001/")))
  }

  test("sourceFormat=binlog: REAL binary binlog through the config-driven pipeline") {
    import graft.cdc.source.BinlogBinary
    CollectingConnector.clear()
    val dir = Files.createTempDirectory("cdc-binlog-src")
    val cols = Seq(BinlogFixture.Col("id", BinlogBinary.T_LONG),
      BinlogFixture.Col("name", BinlogBinary.T_VARCHAR, 255))
    val bytes = new BinlogFixture.Builder(checksum = true)
      .fde()
      .tableMap(11L, "testdb", "users", cols)
      .rows(BinlogBinary.WRITE_ROWS_V2, 11L, cols,
        Seq(Seq(1, "ada"), Seq(2, "bob")))
      .rows(BinlogBinary.UPDATE_ROWS_V2, 11L, cols,
        Seq(Seq(1, "ada"), Seq(1, "ada2")))
      .bytes
    Files.write(dir.resolve("mysql-bin.000001.binlog"), bytes)

    val cfg = Config.parse(
      """{
        |  "serverId": "tb1",
        |  "sourceFormat": "binlog",
        |  "startFlavor": "mysql",
        |  "dbTables": {"testdb": ["users"]},
        |  "connectors": [{"name": "sinkB", "type": "collect"}],
        |  "routes": [{
        |    "name": "users-writes",
        |    "connector": "sinkB",
        |    "operations": ["INSERT", "UPDATE"],
        |    "dbTable": "testdb.users",
        |    "template": "{{ .Data.Operation }}:{{ (index .Data.Rows 0).name }}"
        |  }]
        |}""".stripMargin)
    val ckpt = Files.createTempDirectory("cdc-binlog-ckpt").toString
    val q = CdcPipeline.sync(spark, cfg, dir.toString, ckpt)
    q.awaitTermination(60000)
    val got = CollectingConnector.drain("sinkB").map(_._2).sorted
    // 2 INSERT items + the UPDATE's after image; all decoded from bytes
    assert(got == Seq("INSERT:ada", "INSERT:bob", "UPDATE:ada2"))
  }

  test("lake landing writes (database, table)-partitioned parquet exactly once") {
    val cfg = Config.parse(
      """{"serverId": "land1", "dbTables": {"testdb": ["users"]}}""")
    val out = Files.createTempDirectory("cdc-land-out").toString
    val ckpt = Files.createTempDirectory("cdc-land-ckpt").toString
    val src = writeFixtures()
    CdcPipeline.land(spark, cfg, src, ckpt, out).awaitTermination(60000)
    // re-running against the same checkpoint must not duplicate rows
    CdcPipeline.land(spark, cfg, src, ckpt, out).awaitTermination(60000)

    val landed = spark.read.parquet(out)
    // 2 INSERT items + 1 UPDATE after-image + 1 DELETE = 4 watched items
    assert(landed.count() === 4)
    assert(landed.select("database").distinct().collect().map(_.getString(0)).toSeq === Seq("testdb"))
    val ops = landed.groupBy("operation").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops === Map("INSERT" -> 2L, "UPDATE" -> 1L, "DELETE" -> 1L))
    // partition layout on disk: database=testdb/table=users
    assert(Files.exists(java.nio.file.Paths.get(out, "database=testdb", "table=users")))
    // payload is JSON-lifted downstream
    val row = landed.filter("operation = 'UPDATE'").select("rows_json").head().getString(0)
    assert(row.contains("ada2"))

    // typed lift: declare the table schema at read time
    import org.apache.spark.sql.types._
    val users = CdcPipeline.liftLanded(landed, "testdb", "users",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
    assert(users.schema.fieldNames.toSeq ===
      Seq("operation", "binlog_file", "binlog_position", "id", "name"))
    val upd = users.filter("operation = 'UPDATE'").head()
    assert(upd.getAs[Long]("id") === 1L && upd.getAs[String]("name") === "ada2")
  }

  test("incremental landing: a new binlog segment appends exactly the new rows") {
    val cfg = Config.parse(
      """{"serverId": "land2", "dbTables": {"testdb": ["users"]}}""")
    val out = Files.createTempDirectory("cdc-land-inc-out").toString
    val ckpt = Files.createTempDirectory("cdc-land-inc-ckpt").toString
    val src = writeFixtures()
    CdcPipeline.land(spark, cfg, src, ckpt, out).awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 4)
    // the master rotates to a new binlog file with two more writes —
    // the SAME checkpoint must land exactly the new rows, no replays
    Files.writeString(java.nio.file.Paths.get(src, "mysql-bin.000002.jsonl"),
      """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000002","binlogPosition":120,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["7","gus"]]}
        |{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000002","binlogPosition":160,"database":"testdb","table":"users","colNames":["id","name"],"rows":[["8","hal"]]}""".stripMargin)
    CdcPipeline.land(spark, cfg, src, ckpt, out).awaitTermination(60000)
    val landed = spark.read.parquet(out)
    assert(landed.count() === 6)
    assert(landed.filter("binlog_file = 'mysql-bin.000002'").count() === 2)
    // current state sees the new keys through the unchanged lift
    import org.apache.spark.sql.types._
    val users = CdcPipeline.liftLanded(landed, "testdb", "users",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
    assert(users.filter("operation = 'INSERT'").count() === 4) // 2 original + 2 new
  }

  test("liftLanded tolerates schema drift: extra declared columns read as null") {
    val cfg = Config.parse(
      """{"serverId": "land3", "dbTables": {"testdb": ["users"]}}""")
    val out = Files.createTempDirectory("cdc-land-drift-out").toString
    val ckpt = Files.createTempDirectory("cdc-land-drift-ckpt").toString
    CdcPipeline.land(spark, cfg, writeFixtures(), ckpt, out).awaitTermination(60000)
    // the analyst declares a column the source table didn't have yet —
    // the lake's schema-less JSON bargain means the lift yields NULLs
    // instead of breaking the capture layer (source migrations are
    // invisible to landed history)
    import org.apache.spark.sql.types._
    val users = CdcPipeline.liftLanded(spark.read.parquet(out), "testdb", "users",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType),
        StructField("email", StringType), StructField("age", LongType))))
    val rows = users.filter("operation = 'INSERT'").collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("email")) &&
      r.isNullAt(r.fieldIndex("age"))))
    assert(rows.map(_.getAs[String]("name")).sorted.toSeq === Seq("ada", "bob"))
  }

  test("config batchSize -> sync pipeline delivers JSON-array batches with range keys") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (x: HttpExchange) => {
      got.add(x.getRequestHeaders.getFirst("X-Idempotency-Key") ->
        new String(x.getRequestBody.readAllBytes(), "UTF-8"))
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    try {
      val cfg = Config.parse(
        s"""{
           |  "serverId": "batch1",
           |  "itemByRow": true,
           |  "deliveryPartitions": 1,
           |  "dbTables": {"testdb": ["users"]},
           |  "connectors": [{"name": "wh", "type": "webhook",
           |    "url": "http://127.0.0.1:${server.getAddress.getPort}/hook",
           |    "batchSize": 2}],
           |  "routes": [{
           |    "name": "users-writes", "connector": "wh",
           |    "operations": ["INSERT", "UPDATE"], "dbTable": "testdb.users",
           |    "template": "{\\"id\\":{{ (index .Data.Rows 0).id }}}"
           |  }]
           |}""".stripMargin)
      val ckpt = Files.createTempDirectory("cdc-batch-ckpt").toString
      CdcPipeline.sync(spark, cfg, writeFixtures(), ckpt).awaitTermination(60000)
      // 3 routed items (2 INSERT rows + 1 UPDATE after-image) at
      // batchSize=2 -> one full batch + one flushed tail batch, each a
      // JSON array, keys spanning the batch's event range
      val bodies = got.toArray.map(_.asInstanceOf[(String, String)])
      assert(bodies.length == 2, bodies.mkString("; "))
      assert(bodies.forall { case (_, b) => b.startsWith("[") && b.endsWith("]") })
      val ids = bodies.flatMap(_._2.replaceAll("[\\[\\]{}]", "")
        .split(",").filter(_.nonEmpty).map(_.stripPrefix("\"id\":")))
      assert(ids.sorted.toSeq == Seq("1", "1", "2"))
      // batch boundaries are DETERMINISTIC and LAYOUT-PINNED: dispatch
      // hash-places events by key into the config-pinned
      // deliveryPartitions (1 here, so all three co-locate) and sorts
      // into log order — a replay, or a restart under different session
      // shuffle/AQE confs, rebuilds these exact range keys
      // (receiver-side batch dedup depends on it)
      // (the UPDATE's after-image keeps its image index, rowIdx 1)
      assert(bodies.map(_._1).toSet == Set(
        "mysql-bin.000001/120/0..mysql-bin.000001/120/1",
        "mysql-bin.000001/260/1..mysql-bin.000001/260/1"), bodies.map(_._1).toSeq)
    } finally server.stop(0)
  }

  test("batched dispatch exchange carries only delivery columns, not decoded rows") {
    // The layout-pinning repartition is the batch path's only shuffle;
    // it must ship (connector, payload, ordering keys) and NOTHING of
    // the decoded envelope (data.rows et al) — column pruning through
    // RepartitionByExpression keeps the exchange payload-sized.
    import org.apache.spark.sql.functions._
    val env = spark.range(100).select(
      col("id").as("itemID"),
      struct(lit("mysql-bin.000001").as("binlogFile"),
        col("id").as("binlogPosition")).as("log"),
      struct(lit("INSERT").as("operation"), lit("testdb").as("database"),
        lit("users").as("table"),
        array(map(lit("id"), col("id").cast("string"))).as("rows")).as("data"),
      lit(0).as("rowIdx"))
    val conns = Map("wh" -> (new WebhookConnector("wh", "http://127.0.0.1:9/",
      batchSize = 2): Connector))
    val route = Route("r", "wh", Seq("INSERT"), "testdb.users",
      "{{ .Log.BinlogPosition }}")
    // sparkPlan (pre-AQE): the adaptive wrapper hides its subtree from
    // collect() until execution
    val plan = Connectors.outboundFrame(Seq(route), conns,
      strictCompat = false, deliveryPartitions = 4)(env)
      .queryExecution.sparkPlan
    val exchanges = plan.collect { case n if n.nodeName == "Exchange" => n }
    assert(exchanges.size == 1, plan.toString)
    val shipped = exchanges.head.children.head.output.map(_.name).toSet
    assert(shipped.contains("payload"), shipped)
    for (banned <- Seq("data", "itemID"))
      assert(!shipped.contains(banned),
        s"exchange ships '$banned' — decoded envelope not pruned: $shipped")
    // pipelined per-event mode plans neither exchange nor sort
    val perEvent = Map("wh" -> (new WebhookConnector("wh",
      "http://127.0.0.1:9/"): Connector))
    val p2 = Connectors.outboundFrame(Seq(route), perEvent,
      strictCompat = false, deliveryPartitions = 4)(env)
      .queryExecution.sparkPlan
    assert(!p2.exists(_.nodeName == "Exchange"), p2.toString)
    assert(!p2.exists(_.nodeName == "Sort"), p2.toString)
    // a total-order connector (maxInFlight=1, the senderWorkers=1
    // parity mode) gets the log-order sort but still no exchange
    val orderedConn = Map("wh" -> (new WebhookConnector("wh",
      "http://127.0.0.1:9/", maxInFlight = 1): Connector))
    val p3 = Connectors.outboundFrame(Seq(route), orderedConn,
      strictCompat = false, deliveryPartitions = 4)(env)
      .queryExecution.sparkPlan
    assert(!p3.exists(_.nodeName == "Exchange"), p3.toString)
    assert(p3.exists(_.nodeName == "Sort"), p3.toString)
  }

  test("restart recovery with batching ON: replayed batches carry identical range keys") {
    // The crash window the r7 verdict asked to close e2e: delivery
    // SUCCEEDS at the receiver but the query dies before the checkpoint
    // commits. Simulated from the receiver's seat: the server reads the
    // full body, records it, and answers 500 — delivered-but-
    // unacknowledged. The task fails, the query fails, and a restarted
    // sync() replays the micro-batch from the same checkpoint — under a
    // DIFFERENT session shuffle config, the advisory's re-batching
    // hazard. The layout-pinned dispatch (deliveryPartitions + log-order
    // sort) must re-form BYTE-IDENTICAL batches under identical range
    // idempotency keys, so the receiver's dedup-by-key set sees each
    // batch exactly once.
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val attempts = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String)]()
    val failing = new java.util.concurrent.atomic.AtomicBoolean(true)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
      val attempt = if (failing.get()) 1 else 2
      attempts.add((attempt, x.getRequestHeaders.getFirst("X-Idempotency-Key"), body))
      val code = if (failing.get()) 500 else 200
      x.sendResponseHeaders(code, 2)
      x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    try {
      val cfg = Config.parse(
        s"""{
           |  "serverId": "recover1",
           |  "itemByRow": true,
           |  "deliveryPartitions": 1,
           |  "dbTables": {"testdb": ["users"]},
           |  "connectors": [{"name": "wh", "type": "webhook",
           |    "url": "http://127.0.0.1:${server.getAddress.getPort}/hook",
           |    "batchSize": 2}],
           |  "routes": [{
           |    "name": "users-writes", "connector": "wh",
           |    "operations": ["INSERT", "UPDATE"], "dbTable": "testdb.users",
           |    "template": "{\\"id\\":{{ (index .Data.Rows 0).id }}}"
           |  }]
           |}""".stripMargin)
      val src = writeFixtures()
      val ckpt = Files.createTempDirectory("cdc-recover-ckpt").toString
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      // attempt 1: delivery lands, ack fails -> the query must DIE
      // without committing the batch
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        val q = CdcPipeline.sync(spark, cfg, src, ckpt)
        q.awaitTermination(60000); q.stop()
        fail("query should have failed on the 500 ack")
      }
      assert(failed.getMessage.contains("status 500"), failed.getMessage)
      // attempt 2: receiver healthy again; restart from the SAME
      // checkpoint under a different shuffle width
      failing.set(false)
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(CdcPipeline.sync(spark, cfg, src, ckpt).awaitTermination(60000))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)

      val all = attempts.toArray.map(_.asInstanceOf[(Int, String, String)]).toSeq
      val a1 = all.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
      val a2 = all.filter(_._1 == 2).map(t => t._2 -> t._3).toMap
      // both attempts delivered the SAME batches: identical key sets,
      // byte-identical bodies per key
      assert(a1.keySet == a2.keySet, s"replay re-batched: ${a1.keySet} vs ${a2.keySet}")
      assert(a1.keySet == Set(
        "mysql-bin.000001/120/0..mysql-bin.000001/120/1",
        "mysql-bin.000001/260/1..mysql-bin.000001/260/1"), a1.keySet)
      for (k <- a1.keySet) assert(a1(k) == a2(k), s"batch $k bytes drifted on replay")
      // receiver-side dedup by key observes each batch exactly once
      assert(all.groupBy(_._2).values.map(_.map(x => (x._1, x._3)).distinct.size).toSet
        == Set(2)) // each key: one delivery per attempt, nothing more
      assert(all.map(_._2).distinct.size == 2)
    } finally server.stop(0)
  }

  test("sharded configs partition deliveries exactly (FNV parity mode)") {
    CollectingConnector.clear()
    val base =
      """{
        |  "serverId": "shard-%d",
        |  "dbTables": {"testdb": ["users"]},
        |  "shardingEnabled": true, "shardCount": 2, "shardIndex": %d,
        |  "connectors": [{"name": "s%d", "type": "collect"}],
        |  "routes": [{"name": "all", "connector": "s%d",
        |    "operations": ["INSERT", "UPDATE", "DELETE"], "dbTable": "testdb.users",
        |    "template": "{{ .Log.BinlogPosition }}"}]
        |}""".stripMargin
    val src = writeFixtures()
    (0 until 2).foreach { i =>
      val cfg = Config.parse(base.format(i, i, i, i))
      val ckpt = Files.createTempDirectory(s"cdc-shard-$i").toString
      CdcPipeline.sync(spark, cfg, src, ckpt).awaitTermination(60000)
    }
    val a = CollectingConnector.drain("s0").map(_._1)
    val b = CollectingConnector.drain("s1").map(_._1)
    assert((a.toSet & b.toSet).isEmpty) // no double ownership
    assert(a.size + b.size === 4)       // union = all watched items
  }
}
