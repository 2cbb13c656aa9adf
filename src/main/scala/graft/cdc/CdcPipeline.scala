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

  /** One exploded change-row view over a landed table: one output row
    * per change ROW (posexplode breaks ties inside a multi-row event),
    * with the pk extracted from the schema-less row map. The ordering
    * key (binlog_file, binlog_position, row_idx, elem_idx) totally
    * orders a key's change history — the same order the binlog wrote. */
  private def changeRows(landed: org.apache.spark.sql.DataFrame,
      database: String, table: String, pkField: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val rowsType = ArrayType(MapType(StringType, StringType))
    landed
      .filter(col("database") === database && col("table") === table)
      .select(col("operation"), col("binlog_file"), col("binlog_position"),
        coalesce(col("row_idx"), lit(0)).as("row_idx"),
        posexplode(from_json(col("rows_json"), rowsType)).as(Seq("elem_idx", "row")))
      .withColumn("pk", element_at(col("row"), pkField))
  }

  private def latestPerKey(changes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pk")).orderBy(
      col("binlog_file").desc, col("binlog_position").desc,
      col("row_idx").desc, col("elem_idx").desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The ONE definition of the high-water boundary algebra — the strict
    * "after (file, pos)" filter and its inclusive complement. Every
    * compaction/read/cadence path goes through these two, so the
    * boundary comparison can never desynchronize between coverage
    * claims and delta reads. */
  private def afterHw(file: String, pos: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col("binlog_file") > file ||
      (col("binlog_file") === file && col("binlog_position") > pos)
  }

  private def upToHw(file: String, pos: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col("binlog_file") < file ||
      (col("binlog_file") === file && col("binlog_position") <= pos)
  }

  /** Snapshot materialization for one landed table — the fix for the
    * lake's read-amplification at scale: current-state reads that
    * re-window the FULL change history cost O(history), not O(live
    * rows), once years of changes accumulate. `compact` applies the
    * latest-wins merge ONCE up to a high-water offset and writes:
    *  - `snapshotDir/state/`: the live rows (latest non-DELETE per pk)
    *    as parquet, still schema-less (pk string + row_json) so the
    *    capture layer's schema-drift bargain survives compaction;
    *  - `snapshotDir/_snapshot_meta.json`: the high-water mark
    *    (file, position) the snapshot covers.
    * [[readCurrentState]] then merges the snapshot with only the
    * POST-snapshot changes — the lake scan prunes to the delta via the
    * pushed (file, position) range filter (row-group stats skip
    * fully-compacted files), so read cost tracks live rows + new
    * changes. Deletion semantics need no tombstones in the snapshot: a
    * key whose last covered op was DELETE is simply absent, and any
    * delta change for it outranks the snapshot by offset anyway.
    *
    * `upTo` bounds the covered prefix ((file, position) inclusive);
    * None covers the whole lake as of now. Returns the high-water
    * actually covered: the max change actually SCANNED, never `upTo`
    * itself — if `upTo` points into a quiet region beyond the landed
    * maximum, claiming it would mark future landings in that gap as
    * already covered and silently skip them. The high-water is the ONE
    * driver-side scalar this collects, and it comes from the RAW
    * (file, position) columns of the pruned delta scan — no JSON parse
    * or row explode, so the expensive decode pipeline runs exactly
    * once, in the write pass. Re-compaction is the same call again
    * with a later `upTo`: the merge re-reads snapshot ∪ delta exactly
    * like a read, so compaction cost also tracks live + delta, never
    * full history. Idempotent per (snapshotDir): overwrite semantics.
    *
    * Scale notes: one shuffle on pk (the merge-on-read compaction
    * shape) — the latest-wins window hash-clusters on pk and the state
    * write keeps that clustering, so a 1000-executor read starts
    * pk-clustered with no extra exchange. Generalizes the reference's
    * checkpoint-resume semantics (blsenderwork.go:204-213,
    * cache.go:19-30) from "offset of the last delivered event" to
    * "offset the materialized state covers". */
  def compact(spark: SparkSession, lakeDir: String, snapshotDir: String,
      database: String, table: String, pkField: String,
      upTo: Option[(String, Long)] = None): (String, Long) = {
    import org.apache.spark.sql.functions._
    val lake = spark.read.parquet(lakeDir)
    val bounded = upTo match {
      case Some((f, p)) => lake.filter(upToHw(f, p))
      case None => lake
    }
    val prior = readSnapshotMeta(snapshotDir)
    prior.foreach(validateMeta(_, snapshotDir, database, table, pkField, "compact"))
    // the raw delta, scoped and pruned BEFORE any JSON work: feeds both
    // the high-water scalar (cheap, two pruned columns) and the merge
    val rawDelta = prior match {
      case Some(m) => bounded
        .filter(col("database") === database && col("table") === table)
        .filter(afterHw(m.binlogFile, m.binlogPosition))
      case None => bounded
        .filter(col("database") === database && col("table") === table)
    }
    val hw = rawDelta
      .agg(max(struct(col("binlog_file"), col("binlog_position")))).head()
    require(!hw.isNullAt(0) || prior.nonEmpty,
      s"compact: no changes for ($database, $table) in $lakeDir — nothing to snapshot")
    // coverage never regresses: a DELETE absent from the prior snapshot's
    // rows may still be the prior high-water, so take the max of both
    val scanned = if (hw.isNullAt(0)) None
      else Some((hw.getStruct(0).getString(0), hw.getStruct(0).getLong(1)))
    val (hwFile, hwPos) =
      (scanned.toSeq ++ prior.map(m => (m.binlogFile, m.binlogPosition)))
        .maxBy(identity)(Ordering.Tuple2(Ordering.String, Ordering.Long))
    val deltaChanges = changeRows(rawDelta, database, table, pkField)
    val changes = priorSnapshotChanges(spark, snapshotDir, prior) match {
      case Some(snap) => snap.unionByName(deltaChanges)
      case None => deltaChanges
    }
    latestPerKey(changes)
      .filter(col("operation") =!= "DELETE")
      .select(col("pk"), col("operation"), col("binlog_file"),
        col("binlog_position"), col("row_idx"), col("elem_idx"),
        to_json(col("row")).as("row_json"))
      .write.mode("overwrite").parquet(s"$snapshotDir/state")
    val meta = s"""{"database":${TemplateEngine.toJson(database)},""" +
      s""""table":${TemplateEngine.toJson(table)},""" +
      s""""pkField":${TemplateEngine.toJson(pkField)},""" +
      s""""binlogFile":${TemplateEngine.toJson(hwFile)},"binlogPosition":$hwPos}"""
    java.nio.file.Files.write(snapshotMetaPath(snapshotDir),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (hwFile, hwPos)
  }

  /** The maintenance trigger for [[compact]] — the cadence rule a
    * production lake runs on: re-compact when the un-compacted delta
    * has grown past `maxDeltaRatio` of the snapshot's live rows (and
    * past `minDeltaRows`, so a tiny lake is not re-churned per call),
    * or when no snapshot exists yet. Returns the new high-water when a
    * compaction ran, None when the delta is still within bounds.
    *
    * Cost of the check itself: the snapshot count is a parquet
    * count(*) (footer metadata); the delta count scans only
    * post-high-water row groups — the same pushed (file, position)
    * range filter the read path uses, so fully-compacted files are
    * skipped from their stats. Both are driver-side scalars, like the
    * high-water agg in [[compact]]. */
  def compactIfNeeded(spark: SparkSession, lakeDir: String, snapshotDir: String,
      database: String, table: String, pkField: String,
      maxDeltaRatio: Double = 0.2, minDeltaRows: Long = 0L): Option[(String, Long)] = {
    import org.apache.spark.sql.functions._
    readSnapshotMeta(snapshotDir) match {
      case None =>
        Some(compact(spark, lakeDir, snapshotDir, database, table, pkField))
      case Some(m) =>
        validateMeta(m, snapshotDir, database, table, pkField, "compactIfNeeded")
        val deltaRows = spark.read.parquet(lakeDir)
          .filter(col("database") === database && col("table") === table)
          .filter(afterHw(m.binlogFile, m.binlogPosition))
          .count()
        val snapRows = spark.read.parquet(s"$snapshotDir/state").count()
        if (deltaRows > 0 &&
            deltaRows >= math.max(minDeltaRows.toDouble, maxDeltaRatio * snapRows))
          Some(compact(spark, lakeDir, snapshotDir, database, table, pkField))
        else None
    }
  }

  private def snapshotMetaPath(snapshotDir: String): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(snapshotDir))
    java.nio.file.Paths.get(snapshotDir, "_snapshot_meta.json")
  }

  /** What a snapshot covers: which table, keyed how, up to which
    * (file, position). Every consumer validates the identity fields
    * against its own arguments — a snapshotDir aimed at the wrong
    * table must fail loudly, never merge cross-table state. */
  final case class SnapshotMeta(database: String, table: String,
      pkField: String, binlogFile: String, binlogPosition: Long)

  def readSnapshotMeta(snapshotDir: String): Option[SnapshotMeta] = {
    val p = java.nio.file.Paths.get(snapshotDir, "_snapshot_meta.json")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(p))
      Some(SnapshotMeta(n.get("database").asText(), n.get("table").asText(),
        n.get("pkField").asText(),
        n.get("binlogFile").asText(), n.get("binlogPosition").asLong()))
    }
  }

  private def validateMeta(m: SnapshotMeta, snapshotDir: String,
      database: String, table: String, pkField: String, caller: String): Unit =
    require(m.database == database && m.table == table && m.pkField == pkField,
      s"$caller: snapshot at $snapshotDir tracks (${m.database}, ${m.table}) " +
        s"by '${m.pkField}', got ($database, $table) by '$pkField' — one " +
        "snapshot tracks one table and one key definition")

  /** Snapshot rows re-shaped as change rows (they ARE the latest
    * non-DELETE change up to the covered offset), so the incremental
    * merge is the SAME latest-wins algebra over snapshot ∪ delta. */
  private def priorSnapshotChanges(spark: SparkSession, snapshotDir: String,
      meta: Option[SnapshotMeta]): Option[org.apache.spark.sql.DataFrame] =
    meta.map { _ =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val rowType = MapType(StringType, StringType)
      spark.read.parquet(s"$snapshotDir/state")
        .select(col("operation"), col("binlog_file"), col("binlog_position"),
          col("row_idx"), col("elem_idx"),
          from_json(col("row_json"), rowType).as("row"), col("pk"))
    }

  /** Current state of a landed table from snapshot + delta: the
    * compacted twin of `liftLanded` + latest-wins — identical result,
    * read cost O(live rows + post-snapshot changes) instead of O(full
    * history). Columns: operation, binlog_file, binlog_position, then
    * the declared typed columns (same shape as [[liftLanded]] after a
    * latest-wins merge, minus DELETEd keys). REFUSES a missing or
    * mismatched snapshot (wrong table / key definition) loudly — for a
    * full-history read over an uncompacted lake, use [[liftLanded]]
    * plus a latest-wins merge instead. */
  def readCurrentState(spark: SparkSession, lakeDir: String, snapshotDir: String,
      database: String, table: String,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val meta = readSnapshotMeta(snapshotDir)
    val lake = spark.read.parquet(lakeDir)
    val merged = priorSnapshotChanges(spark, snapshotDir, meta) match {
      case Some(snap) =>
        val m = meta.get
        validateMeta(m, snapshotDir, database, table, m.pkField, "readCurrentState")
        // the delta predicate pushes to the parquet scan: row-group
        // min/max stats on binlog_position skip fully-compacted files
        val delta = changeRows(
          lake.filter(afterHw(m.binlogFile, m.binlogPosition)),
          database, table, m.pkField)
        latestPerKey(snap.unionByName(delta))
      case None =>
        sys.error(s"readCurrentState: no snapshot at $snapshotDir — " +
          "run compact first, or use liftLanded + a latest-wins merge " +
          "for full-history reads")
    }
    val typed = schema.fields.map(f =>
      element_at(col("row"), f.name).cast(f.dataType).as(f.name))
    merged.filter(col("operation") =!= "DELETE")
      .select(Seq(col("operation"), col("binlog_file"), col("binlog_position")) ++ typed: _*)
  }

  /** Run under the restart supervisor (A19): stopInError=false restarts
    * from the checkpoint indefinitely, parity with restartSyncerOnError. */
  def syncSupervised(spark: SparkSession, cfg: GraftConfig, sourcePath: String,
      checkpointDir: String, maxRestarts: Int = -1,
      trigger: Trigger = Trigger.AvailableNow()): Unit =
    RestartSupervisor.run(if (cfg.stopInError) 0 else maxRestarts)(() =>
      sync(spark, cfg, sourcePath, checkpointDir, trigger))
}
