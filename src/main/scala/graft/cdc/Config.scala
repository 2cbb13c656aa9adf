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
    // server.pool.itemByRow (config.go:74-77)
    itemByRow: Boolean = true,
    // server.stopInError (config.go:67) → FailOnDrift / stop-on-sink-error
    stopInError: Boolean = true,
    // source.dbTables (config.go:111)
    dbTables: Map[String, Seq[String]] = Map.empty,
    // source.startLocation (config.go:115-116)
    startFile: Option[String] = None,
    startPosition: Option[Long] = None,
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
    // runtime wiring for the CLI entry point (the reference reads the
    // MySQL endpoint from source.*, config.go:103-116; the replay twin
    // reads a directory) + server.api host/port (config.go:56-60)
    sourcePath: String = "",
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
    maxInFlight: Int = 64,
    // google_pubsub (config.go:135-139: Pubsub.ProjectID / Pubsub.TopicID)
    projectId: String = "",
    topicId: String = "",
    authToken: Option[String] = None)

object Config {

  /** `${ENV:NAME}$` expansion over raw config bytes — parity with the
    * reference's expandEnv (utils.go:28-39): unset vars expand to "". */
  private val EnvRef: Regex = raw"\$$\{ENV:([A-Za-z0-9_]+)\}\$$".r

  def expandEnv(raw: String, env: Map[String, String] = sys.env): String =
    EnvRef.replaceAllIn(raw, m =>
      Regex.quoteReplacement(env.getOrElse(m.group(1), "")))

  /** Load + env-expand + parse a JSON config file. */
  def load(path: String, env: Map[String, String] = sys.env): GraftConfig =
    parse(expandEnv(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8), env))

  def parse(json: String): GraftConfig = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.readTree(json)
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
            maxInFlight = if (c.hasNonNull("maxInFlight")) c.get("maxInFlight").asInt() else 64,
            projectId = if (c.hasNonNull("projectId")) c.get("projectId").asText() else "",
            topicId = if (c.hasNonNull("topicId")) c.get("topicId").asText() else "",
            authToken = Option.when(c.hasNonNull("authToken"))(c.get("authToken").asText()))
        }.toSeq
      else Seq.empty
    GraftConfig(
      serverId = str("serverId", "graft"),
      itemByRow = bool("itemByRow", dflt = true),
      stopInError = bool("stopInError", dflt = true),
      dbTables = dbTables,
      startFile = Option.when(n.hasNonNull("startFile"))(n.get("startFile").asText()),
      startPosition = Option.when(n.hasNonNull("startPosition"))(n.get("startPosition").asLong()),
      shardingEnabled = bool("shardingEnabled", dflt = false),
      shardCount = if (n.hasNonNull("shardCount")) n.get("shardCount").asInt() else 1,
      shardIndex = if (n.hasNonNull("shardIndex")) n.get("shardIndex").asInt() else 0,
      shardKeyTemplate = Option.when(n.hasNonNull("shardKeyTemplate"))(n.get("shardKeyTemplate").asText()),
      routes = routes,
      connectors = connectors,
      strictRouteCompat = bool("strictRouteCompat", dflt = false),
      sourcePath = str("sourcePath", ""),
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
