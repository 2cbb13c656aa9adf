package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.cdc._

/** CLI entry point — the `binwatch sync --config config.yaml` analog
  * (/root/reference/cmd/main.go:26-34, internal/cmd/cmd.go +
  * internal/cmd/sync/sync.go:56-69): load + env-expand the config, start
  * the observability API, and run the supervised sync pipeline
  * (source → decode → shard filter → routes/templates → connectors)
  * until the source drains (`follow:false`) or forever (`follow:true`,
  * the reference's tail behavior).
  *
  * Usage: runMain graft.Sync --config /path/to/config.json
  * Config carries sourcePath/checkpointDir/connectors/routes (Config).
  */
object Sync {

  /** Wire the observability server onto `spark`, run the supervised
    * pipeline, and return the still-running observability server (caller
    * stops it) — separated from `main` so an end-to-end test can drive
    * it on its own session. Blocks until the stream terminates. */
  def run(spark: SparkSession, cfg: GraftConfig): ObservabilityServer = {
    require(cfg.sourcePath.nonEmpty, "config must set sourcePath (replay directory)")
    require(cfg.checkpointDir.nonEmpty, "config must set checkpointDir")
    val obs = new ObservabilityServer(cfg.serverId, cfg.apiHost, cfg.apiPort)
    obs.attach(spark)
    val port = obs.start()
    // serverapi.go:78-86 analog: the API is up before the pipeline runs.
    println(s"[sync] ${cfg.serverId}: observability API on ${cfg.apiHost}:$port")
    val trigger =
      if (cfg.follow) Trigger.ProcessingTime("1 second") else Trigger.AvailableNow()
    try
      CdcPipeline.syncSupervised(spark, cfg, cfg.sourcePath, cfg.checkpointDir,
        trigger = trigger)
    catch {
      case e: Throwable =>
        // stop the HTTP dispatcher (non-daemon thread) so a failed CLI
        // run exits with the error instead of hanging the JVM
        obs.stop()
        throw e
    }
    obs
  }

  def main(args: Array[String]): Unit = {
    val cfgPath = args.sliding(2, 1).collectFirst { case Array("--config", p) => p }
      .getOrElse(sys.error("usage: graft.Sync --config <config.json>"))
    val cfg = Config.load(cfgPath)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName(s"graft-sync-${cfg.serverId}")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // logger.level (config.go:55) → the session's log level; the
    // reference's "warning" spelling maps onto log4j WARN
    spark.sparkContext.setLogLevel(cfg.loggerLevel.toLowerCase match {
      case "trace" => "TRACE"
      case "debug" => "DEBUG"
      case "info" => "INFO"
      case "error" => "ERROR"
      case "fatal" => "FATAL"
      case _ => "WARN" // "", "warn", "warning", unknown
    })
    val obs =
      try run(spark, cfg)
      finally spark.stop()
    obs.stop()
  }
}
