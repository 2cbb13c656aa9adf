package graft.cdc

import java.time.Duration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Config-to-pipeline assembly — the `binwatch sync --config` analog
  * (/root/reference/internal/cmd/sync/sync.go:56-69 →
  * internal/binwatch/binwatch.go:118-144): a GraftConfig becomes one
  * running Structured Streaming query wiring source → decode → shard
  * filter → routes/templates → connector sinks, checkpointed for resume.
  *
  * Sharding runs in FNV parity mode here so N config-sharded jobs agree
  * with live binwatch replicas about event ownership (Sharding.Fnv1aParity);
  * a single unsharded job should instead use Sharding.repartitionByShard
  * (the Spark-native form).
  */
object CdcPipeline {

  /** Connector factory from config (A15 — connectors.go:17-33). */
  def buildConnectors(cfg: GraftConfig): Map[String, Connector] =
    cfg.connectors.map { c =>
      c.name -> (c.connType match {
        case "webhook" =>
          new WebhookConnector(c.name, c.url, c.method, c.headers,
            for (u <- c.basicAuthUser; p <- c.basicAuthPass) yield (u, p),
            Duration.ofSeconds(10), c.maxInFlight, c.tlsSkipVerify,
            c.batchSize): Connector
        case "google_pubsub" =>
          new PubSubConnector(c.name, c.projectId, c.topicId,
            endpoint = if (c.url.nonEmpty) c.url else "https://pubsub.googleapis.com",
            authToken = c.authToken,
            tokenMinter = c.serviceAccount.map(GcpTokenMinter.fromConfig)): Connector
        case "collect" => new CollectingConnector(c.name): Connector
        case other => sys.error(s"unsupported '$other' connector type (connectors.go:29-31 parity)")
      })
    }.toMap

  // One mirror per distinct (type, endpoint, id) for the JVM lifetime:
  // the restart supervisor re-invokes sync() on every restart, and a
  // fresh RespClient per restart would leak one Redis connection each
  // time. Mirrors are tiny (a socket or a file path); process exit
  // closes them.
  private val mirrorCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, String), OffsetMirror]()

  /** Offset-mirror factory (A16/A17 ops parity — cache.go:17-33 analog):
    * cacheType local|redis, "" = none. Instances are cached per config
    * identity so supervised restarts reuse the same connection. */
  def buildMirror(cfg: GraftConfig): Option[OffsetMirror] = cfg.cacheType match {
    case "" => None
    case "local" => Some(mirrorCache.computeIfAbsent(
      ("local", cfg.cachePath, 0, cfg.serverId),
      _ => new LocalOffsetMirror(cfg.cachePath, cfg.serverId)))
    case "redis" => Some(mirrorCache.computeIfAbsent(
      ("redis", cfg.redisHost, cfg.redisPort, cfg.serverId),
      _ => new RedisOffsetMirror(
        new RespClient(cfg.redisHost, cfg.redisPort, cfg.redisPassword), cfg.serverId)))
    case other => sys.error(s"unsupported '$other' cache type (cache.go parity: local|redis)")
  }

  /** One reader builder for every config-assembled entry point (sync,
    * land): source format/flavor, bounded admission (server.pool.size),
    * the live replication endpoint incl. TLS/timeout/heartbeat options,
    * and the start location hints. */
  private def configuredReader(spark: SparkSession, cfg: GraftConfig,
      sourcePath: String): org.apache.spark.sql.streaming.DataStreamReader = {
    var reader = spark.readStream.format("binlog-replay").option("path", sourcePath)
      .option("format", cfg.sourceFormat).option("flavor", cfg.startFlavor)
    if (cfg.socketSource.nonEmpty) reader = reader.option("socket", cfg.socketSource)
    if (cfg.poolSize > 0) reader = reader.option("maxEventsPerTrigger", cfg.poolSize.toString)
    if (cfg.sourceFormat == "replication") {
      reader = reader.option("host", cfg.sourceHost)
        .option("port", cfg.sourcePort.toString)
        .option("user", cfg.sourceUser).option("password", cfg.sourcePassword)
        .option("slaveServerId", cfg.sourceServerId.toString)
        .option("tlsMode", cfg.sourceTlsMode)
        .option("readTimeoutMs", cfg.readTimeoutMs.toString)
        .option("heartbeatPeriodMs", cfg.heartbeatPeriodMs.toString)
        .option("restartOnError", cfg.restartSyncerOnError.toString)
      if (cfg.sourceTlsCa.nonEmpty) reader = reader.option("tlsCa", cfg.sourceTlsCa)
    }
    cfg.startFile.foreach(f => reader = reader.option("startingFile", f))
    cfg.startPosition.foreach(p => reader = reader.option("startingLine", p.toString))
    cfg.startGtid.foreach(g => reader = reader.option("startingGtid", g))
    reader
  }

  /** Assemble and start the sync pipeline over a replay source directory.
    * `startPosition` maps to the replay source's line offset (the replay
    * analog of a binlog byte position; a production binlog source would
    * pass it through as-is). */
  def sync(spark: SparkSession, cfg: GraftConfig, sourcePath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {

    var envelope = Decode.decode(
      configuredReader(spark, cfg, sourcePath).load(),
      cfg.dbTables,
      itemByRow = cfg.itemByRow,
      drift = if (cfg.stopInError) Decode.FailOnDrift else Decode.DropOnDrift)

    if (cfg.shardingEnabled && cfg.shardCount > 1)
      envelope = envelope.filter(Sharding.shardFilter(
        cfg.shardCount, cfg.shardIndex, cfg.shardKeyTemplate, Sharding.Fnv1aParity))

    // Mirror the batch-max (file, position) AFTER delivery — the
    // reference's store-after-send ordering (blsenderwork.go:204-213):
    // a crash between send and store replays, never skips.
    val dispatch = Connectors.forEachBatch(
      cfg.routes, buildConnectors(cfg), cfg.strictRouteCompat,
      cfg.deliveryPartitions)
    val mirror = buildMirror(cfg)
    val deliverAndMirror: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (batch, id) =>
        if (mirror.isEmpty) dispatch(batch, id)
        else {
          // the mirror agg is a SECOND action on the batch — persist so
          // the bounded micro-batch is computed once, not re-read from
          // the source for the max-offset pass
          batch.persist()
          try {
            dispatch(batch, id)
            import org.apache.spark.sql.functions._
            val r = batch.agg(max(struct(
              col("log.binlogFile"), col("log.binlogPosition")))).head()
            if (!r.isNullAt(0)) {
              val st = r.getStruct(0)
              mirror.get.store(st.getString(0), st.getLong(1))
            }
          } finally batch.unpersist()
        }

    envelope.writeStream
      .queryName(s"graft-sync-${cfg.serverId}")
      .foreachBatch(deliverAndMirror)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Lake landing: decode the watched stream and append it to parquet
    * partitioned by (database, table) — the capture layer a large-scale
    * pipeline batches analytics from. Unlike the connector path this is
    * EXACTLY-once end-to-end: the file sink's commit log only publishes
    * files for committed batches. Partition columns are promoted out of
    * the data struct (nested fields can't be partition keys); row payload
    * is kept as JSON so the landing schema is stable under source-table
    * schema drift (typed lift happens downstream via from_json per table).
    */
  def land(spark: SparkSession, cfg: GraftConfig, sourcePath: String,
      checkpointDir: String, outDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions._
    Decode.decode(configuredReader(spark, cfg, sourcePath).load(),
        cfg.dbTables, itemByRow = cfg.itemByRow,
        drift = if (cfg.stopInError) Decode.FailOnDrift else Decode.DropOnDrift)
      .select(
        col("data.database").as("database"), col("data.table").as("table"),
        col("data.operation").as("operation"),
        col("log.binlogFile").as("binlog_file"),
        col("log.binlogPosition").as("binlog_position"), col("rowIdx").as("row_idx"),
        to_json(col("data.rows")).as("rows_json"))
      .writeStream
      .queryName(s"graft-land-${cfg.serverId}")
      .format("parquet")
      .partitionBy("database", "table")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Typed lift of a landed table: rows_json → one row per change row
    * with typed columns per the declared table schema (the downstream
    * half of `land`'s schema-stability bargain — the lake stores
    * schema-less JSON, analytics declare the schema at read time, so a
    * source-table migration never breaks the capture layer). */
  def liftLanded(landed: org.apache.spark.sql.DataFrame,
      database: String, table: String,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val rowsType = ArrayType(MapType(StringType, StringType))
    val base = landed
      .filter(col("database") === database && col("table") === table)
      .withColumn("row", explode(from_json(col("rows_json"), rowsType)))
    val typed = schema.fields.map(f =>
      element_at(col("row"), f.name).cast(f.dataType).as(f.name))
    base.select(
      (Seq(col("operation"), col("binlog_file"), col("binlog_position")) ++ typed): _*)
  }

  /** Run under the restart supervisor (A19): stopInError=false restarts
    * from the checkpoint indefinitely, parity with restartSyncerOnError. */
  def syncSupervised(spark: SparkSession, cfg: GraftConfig, sourcePath: String,
      checkpointDir: String, maxRestarts: Int = -1,
      trigger: Trigger = Trigger.AvailableNow()): Unit =
    RestartSupervisor.run(if (cfg.stopInError) 0 else maxRestarts)(() =>
      sync(spark, cfg, sourcePath, checkpointDir, trigger))
}
