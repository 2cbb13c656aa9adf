package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.matching.Regex

/** Engine configuration model — mirrors the reference's `ConfigT` surface
  * (/root/reference/api/v1alpha2/config.go:22-29) re-shaped for the Spark
  * runtime. Parsed from JSON (Jackson ships with Spark; the reference's
  * YAML layout maps 1:1 — YAML support would only add a dependency).
  */
final case class GraftConfig(
    serverId: String = "graft",
    // logger.level (config.go:55) — "" and unknown values fall back to
    // the engine's quiet WARN default
    loggerLevel: String = "",
    // server.pool.itemByRow (config.go:74-77)
    itemByRow: Boolean = true,
    // server.pool.size (config.go:74-75): the reference's 20-slot queue
    // capacity ≙ per-micro-batch admission cap; 0 = unbounded
    poolSize: Long = 0L,
    // server.stopInError (config.go:67) → FailOnDrift / stop-on-sink-error
    stopInError: Boolean = true,
    // server.restartSyncerOnError (config.go:68): false = a live-stream
    // error stops the replication tail (loudly — the feed poisons its
    // read surface so the query fails, the stopInError analog) instead
    // of reconnect-with-backoff. Default FALSE = the reference's Go
    // zero value and its example yaml.
    restartSyncerOnError: Boolean = false,
    // source.readTimeout / source.heartbeatPeriod (config.go:113-114,
    // Go duration strings): socket SO_TIMEOUT and the requested
    // @master_heartbeat_period — together they detect a silent master
    readTimeoutMs: Long = 90000L,
    heartbeatPeriodMs: Long = 60000L,
    // source.dbTables (config.go:111)
    dbTables: Map[String, Seq[String]] = Map.empty,
    // source.flavor (config.go:105): mysql | mariadb — selects the
    // replication dialect a live client speaks (mariadb GTID events,
    // heartbeat framing); file feeds carry it as a documented no-op
    startFlavor: String = "mysql",
    // source.startLocation (config.go:115-116)
    startFile: Option[String] = None,
    startPosition: Option[Long] = None,
    // GTID-style start position (mysql "uuid:1-5" set / mariadb "0-1-5")
    // — the replication-protocol alternative to (file, position); replay
    // feeds have no GTID index, so it's threaded to the feed and ignored
    startGtid: Option[String] = None,
    // segment encoding of sourcePath: "jsonl" replay fixtures, "binlog"
    // real binary files (BinlogFileFeed), or "replication" (live MySQL
    // wire protocol spooling relay segments into sourcePath)
    sourceFormat: String = "jsonl",
    // live replication endpoint (source.host/port/user/password —
    // config.go:104-116); used when sourceFormat == "replication"
    sourceHost: String = "",
    sourcePort: Int = 3306,
    sourceUser: String = "root",
    sourcePassword: String = "",
    // replica server id registered with the master (source.serverID —
    // go-mysql BinlogSyncerConfig.ServerID): MUST be unique among ALL
    // replicas of one master; a duplicate makes the master kill the
    // other replica's connection on every (re)connect
    sourceServerId: Long = 1001L,
    // connection TLS (an extension: the reference never exposes
    // go-mysql's TLSConfig) — the mysql-client --ssl-mode family:
    // disabled | required | verify_ca | verify_identity, with
    // source.tlsCa naming the CA certificate file for the verify modes
    sourceTlsMode: String = "disabled",
    sourceTlsCa: String = "",
    // sharding (config.go:42-47)
    shardingEnabled: Boolean = false,
    shardCount: Int = 1,
    shardIndex: Int = 0,
    shardKeyTemplate: Option[String] = None,
    // routes (config.go:161-167)
    routes: Seq[Route] = Seq.empty,
    // connectors (config.go:129-155)
    connectors: Seq[ConnectorConfig] = Seq.empty,
    // strict reference compat for the empty-dbTable quirk (SURVEY §2.A)
    strictRouteCompat: Boolean = false,
    // ENGINE EXTENSION: partition count the dispatcher hash-pins batched
    // delivery to (only used when some connector has batchSize > 1).
    // Batch identity — and hence the range idempotency keys receivers
    // dedup on — is a function of this value: keep it STABLE across
    // restarts of one pipeline; changing it re-batches replayed events
    // under new keys (duplicates for non-idempotent receivers).
    deliveryPartitions: Int = 32,
    // runtime wiring for the CLI entry point (the reference reads the
    // MySQL endpoint from source.*, config.go:103-116; the replay twin
    // reads a directory, optionally fed live over TCP) + server.api
    // host/port (config.go:56-60)
    sourcePath: String = "",
    // "host:port" -> tail a live line-delimited stream into sourcePath
    // (SpoolingSocketFeed); "" = read existing replay files only
    socketSource: String = "",
    checkpointDir: String = "",
    apiHost: String = "0.0.0.0",
    apiPort: Int = 0,
    // continuous tail (reference behavior) vs drain-and-exit
    follow: Boolean = false,
    // offset mirror (A16/A17 ops parity — cache.local.go / cache.redis.go);
    // "" = no mirror (SS checkpoints remain the resume source of truth)
    cacheType: String = "",
    cachePath: String = "",
    redisHost: String = "localhost",
    redisPort: Int = 6379,
    redisPassword: Option[String] = None)

/** Connector definition — reference `ConnectorT` (config.go:129-155).
  * type: "webhook" (url/method/headers/basic auth), "google_pubsub"
  * (projectId/topicId, `url` doubles as the endpoint override for
  * emulators), or "collect" (in-JVM test sink). */
final case class ConnectorConfig(
    name: String,
    connType: String,
    url: String = "",
    method: String = "POST",
    headers: Map[String, String] = Map.empty,
    basicAuthUser: Option[String] = None,
    basicAuthPass: Option[String] = None,
    // webhook TLS verification skip (connectors.webhook.go:38-39)
    tlsSkipVerify: Boolean = false,
    maxInFlight: Int = 64,
    // ENGINE EXTENSION (no reference equivalent): webhook delivery
    // batching — N rendered payloads per request as a JSON array.
    // 1 = per-event delivery, reference parity.
    batchSize: Int = 1,
    // google_pubsub (config.go:135-139: Pubsub.ProjectID / Pubsub.TopicID)
    projectId: String = "",
    topicId: String = "",
    authToken: Option[String] = None,
    // Service-account credentials: inline JSON or a path to the usual
    // credentials file. The reference's client library resolves
    // application-default credentials itself; this is the explicit
    // equivalent (GcpTokenMinter mints + refreshes the Bearer token).
    serviceAccount: Option[String] = None)

object Config {

  /** `${ENV:NAME}$` expansion over raw config bytes — parity with the
    * reference's expandEnv (utils.go:28-39): unset vars expand to "". */
  private val EnvRef: Regex = raw"\$$\{ENV:([A-Za-z0-9_]+)\}\$$".r

  def expandEnv(raw: String, env: Map[String, String] = sys.env): String =
    EnvRef.replaceAllIn(raw, m =>
      Regex.quoteReplacement(env.getOrElse(m.group(1), "")))

  /** Load + env-expand + parse a config file. `.yaml`/`.yml` files are
    * parsed as YAML (jackson-dataformat-yaml, shipped with Spark);
    * anything shaped like the reference's `binwatch.v1alpha2` layout
    * (a `server:`/`source:` section) goes through the reference-compat
    * mapping, so an existing binwatch config file is a drop-in. */
  def load(path: String, env: Map[String, String] = sys.env): GraftConfig = {
    val raw = expandEnv(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8), env)
    val mapper =
      if (path.endsWith(".yaml") || path.endsWith(".yml"))
        new com.fasterxml.jackson.databind.ObjectMapper(
          new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
      else new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(raw)
    if (tree.hasNonNull("server") || tree.hasNonNull("source"))
      parseReference(tree)
    else parseTree(tree)
  }

  def parse(json: String): GraftConfig =
    parseTree(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))

  /** source.flavor validation — the two replication dialects go-mysql
    * accepts (config.go:105 feeds BinlogSyncerConfig.Flavor). */
  private def checkFlavor(f: String): String = {
    val v = if (f.isEmpty) "mysql" else f
    require(v == "mysql" || v == "mariadb",
      s"source.flavor must be mysql or mariadb, got '$f'")
    v
  }

  /** Go `time.Duration` rendering → milliseconds ("90s", "1m30s",
    * "500ms", "2h"; a bare number is nanoseconds, Go's unit). */
  private[cdc] def parseGoDuration(s: String): Long = {
    val t = s.trim
    if (t.isEmpty) 0L
    else if (t.matches("-?\\d+")) math.round(t.toLong / 1000000.0) // bare = ns (Go)
    else {
      val re = "([0-9]*\\.?[0-9]+)(ns|us|µs|ms|s|m|h)".r
      val parts = re.findAllMatchIn(t).toSeq
      require(parts.nonEmpty && parts.map(_.matched).mkString == t,
        s"bad duration '$s'")
      val ms = parts.map { m =>
        val v = m.group(1).toDouble // Go's grammar allows fractions ("1.5s")
        m.group(2) match {
          case "ns" => v / 1000000.0
          case "us" | "µs" => v / 1000.0
          case "ms" => v
          case "s" => v * 1000.0
          case "m" => v * 60000.0
          case "h" => v * 3600000.0
        }
      }.sum
      math.round(ms)
    }
  }

  /** Reference-layout compat (api/v1alpha2/config.go): maps the nested
    * server/source/sharding/connectors/routes sections onto GraftConfig.
    * MySQL endpoint fields (source.host/user/...) have no replay analog
    * and are ignored; `sourcePath`/`checkpointDir`/`follow` may ride
    * along as top-level extras in the same file. */
  private def parseReference(n: com.fasterxml.jackson.databind.JsonNode): GraftConfig = {
    import scala.jdk.CollectionConverters._
    def at(p: String*): Option[com.fasterxml.jackson.databind.JsonNode] =
      p.foldLeft(Option(n)) { (o, k) => o.flatMap(x => Option(x.get(k)).filter(!_.isNull)) }
    def strAt(dflt: String, p: String*): String = at(p: _*).map(_.asText()).getOrElse(dflt)
    def boolAt(dflt: Boolean, p: String*): Boolean = at(p: _*).map(_.asBoolean()).getOrElse(dflt)
    def intAt(dflt: Int, p: String*): Int = at(p: _*).map(_.asInt()).getOrElse(dflt)

    val dbTables: Map[String, Seq[String]] = at("source", "dbTables")
      .map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq).toMap)
      .getOrElse(Map.empty)

    // server.senderWorkers is the reference's ordering/parallelism knob
    // (1 = total order, README.md:38); it maps onto every sink's bounded
    // in-flight window. Absent -> 1: the conservative, order-preserving
    // reading (the reference has no working zero-value default).
    val senders = at("server", "senderWorkers").map(_.asInt())
    val connectors: Seq[ConnectorConfig] = at("connectors")
      .map(_.elements().asScala.map { c =>
        def cAt(p: String*): Option[com.fasterxml.jackson.databind.JsonNode] =
          p.foldLeft(Option(c)) { (o, k) => o.flatMap(x => Option(x.get(k)).filter(!_.isNull)) }
        val tpe = c.get("type").asText()
        ConnectorConfig(
          name = c.get("name").asText(),
          connType = tpe,
          maxInFlight = senders.filter(_ > 0).getOrElse(1), // 0 (Go zero value) would deadlock the window
          url = cAt("webhook", "url").map(_.asText()).getOrElse(""),
          method = cAt("webhook", "method").map(_.asText()).getOrElse("POST"),
          headers = cAt("webhook", "headers")
            .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty),
          basicAuthUser = cAt("webhook", "credentials", "username").map(_.asText()).filter(_.nonEmpty),
          basicAuthPass = cAt("webhook", "credentials", "password").map(_.asText()).filter(_.nonEmpty),
          tlsSkipVerify = cAt("webhook", "tlsSkipVerify").exists(_.asBoolean()),
          batchSize = cAt("webhook", "batchSize").map(_.asInt()).map { v =>
            require(v > 0, s"webhook.batchSize must be >= 1, got $v " +
              "(1 = per-event delivery; omit the key for the default)")
            v
          }.getOrElse(1),
          projectId = cAt("pubsub", "projectID").map(_.asText()).getOrElse(""),
          topicId = cAt("pubsub", "topicID").map(_.asText()).getOrElse(""),
          serviceAccount = cAt("pubsub", "serviceAccount").map(_.asText()).filter(_.nonEmpty))
      }.toSeq)
      .getOrElse(Seq.empty)

    val routes: Seq[Route] = at("routes")
      .map(_.elements().asScala.map { r =>
        Route(
          name = r.get("name").asText(),
          connector = r.get("connector").asText(),
          operations = Option(r.get("operations"))
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty),
          dbTable = Option(r.get("dbTable")).filter(!_.isNull).map(_.asText()).getOrElse(""),
          template = Option(r.get("template")).filter(!_.isNull).map(_.asText()).getOrElse(""))
      }.toSeq)
      .getOrElse(Seq.empty)

    val cacheEnabled = boolAt(dflt = false, "server", "cache", "enabled")
    GraftConfig(
      serverId = strAt("graft", "server", "id"),
      loggerLevel = strAt("", "logger", "level"),
      itemByRow = boolAt(dflt = true, "server", "pool", "itemByRow"),
      poolSize = at("server", "pool", "size").map(_.asLong()).getOrElse(0L),
      stopInError = boolAt(dflt = true, "server", "stopInError"),
      restartSyncerOnError = boolAt(dflt = false, "server", "restartSyncerOnError"),
      readTimeoutMs = at("source", "readTimeout")
        .map(x => parseGoDuration(x.asText())).getOrElse(90000L),
      heartbeatPeriodMs = at("source", "heartbeatPeriod")
        .map(x => parseGoDuration(x.asText())).getOrElse(60000L),
      dbTables = dbTables,
      startFlavor = checkFlavor(strAt("mysql", "source", "flavor")),
      startFile = at("source", "startLocation", "file").map(_.asText()),
      startPosition = at("source", "startLocation", "position").map(_.asLong()),
      startGtid = at("source", "startLocation", "gtid").map(_.asText()).filter(_.nonEmpty),
      sourceFormat = strAt("jsonl", "sourceFormat"),
      sourceHost = strAt("", "source", "host"),
      sourcePort = intAt(3306, "source", "port"),
      sourceUser = strAt("root", "source", "user"),
      sourcePassword = strAt("", "source", "password"),
      sourceServerId = at("source", "serverID").map(_.asLong()).getOrElse(1001L),
      sourceTlsMode = strAt("disabled", "source", "tlsMode"),
      sourceTlsCa = strAt("", "source", "tlsCa"),
      shardingEnabled = boolAt(dflt = false, "sharding", "enabled"),
      shardCount = intAt(1, "sharding", "count"),
      shardIndex = intAt(0, "sharding", "index"),
      shardKeyTemplate = at("sharding", "keyTemplate").map(_.asText()).filter(_.nonEmpty),
      routes = routes,
      connectors = connectors,
      strictRouteCompat = boolAt(dflt = false, "strictRouteCompat"),
      deliveryPartitions = {
        val v = intAt(32, "deliveryPartitions")
        require(v > 0, s"deliveryPartitions must be >= 1, got $v"); v
      },
      sourcePath = strAt("", "sourcePath"),
      socketSource = strAt("", "socketSource"),
      checkpointDir = strAt("", "checkpointDir"),
      apiHost = strAt("0.0.0.0", "server", "host"),
      apiPort = intAt(0, "server", "port"),
      follow = boolAt(dflt = false, "follow"),
      cacheType = if (cacheEnabled) strAt("", "server", "cache", "type") else "",
      cachePath = strAt("", "server", "cache", "local", "path"),
      redisHost = strAt("localhost", "server", "cache", "redis", "host"),
      redisPort = intAt(6379, "server", "cache", "redis", "port"),
      redisPassword = at("server", "cache", "redis", "password").map(_.asText()).filter(_.nonEmpty))
  }

  private def parseTree(n: com.fasterxml.jackson.databind.JsonNode): GraftConfig = {
    def str(p: String, dflt: String): String =
      if (n.hasNonNull(p)) n.get(p).asText() else dflt
    def bool(p: String, dflt: Boolean): Boolean =
      if (n.hasNonNull(p)) n.get(p).asBoolean() else dflt
    import scala.jdk.CollectionConverters._
    val dbTables: Map[String, Seq[String]] =
      if (n.hasNonNull("dbTables"))
        n.get("dbTables").properties().asScala
          .map(e => e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq)
          .toMap
      else Map.empty
    val routes: Seq[Route] =
      if (n.hasNonNull("routes"))
        n.get("routes").elements().asScala.map { r =>
          Route(
            name = r.get("name").asText(),
            connector = r.get("connector").asText(),
            operations = r.get("operations").elements().asScala.map(_.asText()).toSeq,
            dbTable = if (r.hasNonNull("dbTable")) r.get("dbTable").asText() else "",
            template = if (r.hasNonNull("template")) r.get("template").asText() else "")
        }.toSeq
      else Seq.empty
    val connectors: Seq[ConnectorConfig] =
      if (n.hasNonNull("connectors"))
        n.get("connectors").elements().asScala.map { c =>
          ConnectorConfig(
            name = c.get("name").asText(),
            connType = c.get("type").asText(),
            url = if (c.hasNonNull("url")) c.get("url").asText() else "",
            method = if (c.hasNonNull("method")) c.get("method").asText() else "POST",
            headers =
              if (c.hasNonNull("headers"))
                c.get("headers").properties().asScala
                  .map(e => e.getKey -> e.getValue.asText()).toMap
              else Map.empty,
            basicAuthUser = Option.when(c.hasNonNull("basicAuthUser"))(c.get("basicAuthUser").asText()),
            basicAuthPass = Option.when(c.hasNonNull("basicAuthPass"))(c.get("basicAuthPass").asText()),
            tlsSkipVerify = c.hasNonNull("tlsSkipVerify") && c.get("tlsSkipVerify").asBoolean(),
            maxInFlight = if (c.hasNonNull("maxInFlight")) c.get("maxInFlight").asInt() else 64,
            batchSize =
              if (c.hasNonNull("batchSize")) {
                val v = c.get("batchSize").asInt()
                require(v > 0, s"batchSize must be >= 1, got $v " +
                  "(1 = per-event delivery; omit the key for the default)")
                v
              } else 1,
            projectId = if (c.hasNonNull("projectId")) c.get("projectId").asText() else "",
            topicId = if (c.hasNonNull("topicId")) c.get("topicId").asText() else "",
            authToken = Option.when(c.hasNonNull("authToken"))(c.get("authToken").asText()),
            serviceAccount = Option.when(c.hasNonNull("serviceAccount"))(c.get("serviceAccount").asText()))
        }.toSeq
      else Seq.empty
    GraftConfig(
      serverId = str("serverId", "graft"),
      loggerLevel = str("loggerLevel", ""),
      itemByRow = bool("itemByRow", dflt = true),
      poolSize = if (n.hasNonNull("poolSize")) n.get("poolSize").asLong() else 0L,
      stopInError = bool("stopInError", dflt = true),
      restartSyncerOnError = bool("restartSyncerOnError", dflt = false),
      readTimeoutMs =
        if (n.hasNonNull("readTimeoutMs")) n.get("readTimeoutMs").asLong() else 90000L,
      heartbeatPeriodMs =
        if (n.hasNonNull("heartbeatPeriodMs")) n.get("heartbeatPeriodMs").asLong() else 60000L,
      dbTables = dbTables,
      startFlavor = checkFlavor(str("startFlavor", "mysql")),
      startFile = Option.when(n.hasNonNull("startFile"))(n.get("startFile").asText()),
      startPosition = Option.when(n.hasNonNull("startPosition"))(n.get("startPosition").asLong()),
      startGtid = Option.when(n.hasNonNull("startGtid"))(n.get("startGtid").asText()),
      sourceFormat = str("sourceFormat", "jsonl"),
      sourceHost = str("sourceHost", ""),
      sourcePort = if (n.hasNonNull("sourcePort")) n.get("sourcePort").asInt() else 3306,
      sourceUser = str("sourceUser", "root"),
      sourcePassword = str("sourcePassword", ""),
      sourceServerId =
        if (n.hasNonNull("sourceServerId")) n.get("sourceServerId").asLong() else 1001L,
      sourceTlsMode = str("sourceTlsMode", "disabled"),
      sourceTlsCa = str("sourceTlsCa", ""),
      shardingEnabled = bool("shardingEnabled", dflt = false),
      shardCount = if (n.hasNonNull("shardCount")) n.get("shardCount").asInt() else 1,
      shardIndex = if (n.hasNonNull("shardIndex")) n.get("shardIndex").asInt() else 0,
      shardKeyTemplate = Option.when(n.hasNonNull("shardKeyTemplate"))(n.get("shardKeyTemplate").asText()),
      routes = routes,
      connectors = connectors,
      strictRouteCompat = bool("strictRouteCompat", dflt = false),
      deliveryPartitions =
        if (n.hasNonNull("deliveryPartitions")) {
          val v = n.get("deliveryPartitions").asInt()
          require(v > 0, s"deliveryPartitions must be >= 1, got $v"); v
        } else 32,
      sourcePath = str("sourcePath", ""),
      socketSource = str("socketSource", ""),
      checkpointDir = str("checkpointDir", ""),
      apiHost = str("apiHost", "0.0.0.0"),
      apiPort = if (n.hasNonNull("apiPort")) n.get("apiPort").asInt() else 0,
      follow = bool("follow", dflt = false),
      cacheType = str("cacheType", ""),
      cachePath = str("cachePath", ""),
      redisHost = str("redisHost", "localhost"),
      redisPort = if (n.hasNonNull("redisPort")) n.get("redisPort").asInt() else 6379,
      redisPassword = Option.when(n.hasNonNull("redisPassword"))(n.get("redisPassword").asText()))
  }
}
