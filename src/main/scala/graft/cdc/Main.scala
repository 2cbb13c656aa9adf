package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Production entry point for the CDC service — the spark-submit analog
  * of the reference's `binwatch run` container command (cited:
  * /root/reference/cmd/run.go, charts/binwatch/templates/statefulset.yaml).
  *
  * Usage (all settable by env for container deployments):
  *   spark-submit --class graft.cdc.Main <jar> [configPath] [sourcePath]
  *                [checkpointDir]
  *   GRAFT_CONFIG         config YAML (default /etc/graft/config.yaml);
  *                        the reference's own v1alpha2 layout parses
  *                        as-is, `${ENV:NAME}$` placeholders expand from
  *                        the pod environment (Config.load) — which is
  *                        how the StatefulSet injects shard identity
  *   GRAFT_SOURCE_PATH    binlog source: a replay/relay segment dir; the
  *                        live `replication` format spools here
  *   GRAFT_CHECKPOINT_DIR streaming checkpoint root (per shard —
  *                        StatefulSet volumeClaimTemplates give each
  *                        ordinal its own)
  *   GRAFT_TRIGGER        "continuous:<interval>" = ProcessingTime
  *                        micro-batches (the service mode);
  *                        "available-now" (default) = drain-and-exit
  *                        (the batch/backfill mode)
  *
  * Runs the supervised sync loop (restart policy from the config's
  * `stopInError`/`restartSyncerOnError`) with the observability HTTP
  * server attached (`/healthz`, `/api/v1/server`) — the same surface
  * the chart's liveness/readiness probes hit.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cfgPath = args.headOption
      .orElse(sys.env.get("GRAFT_CONFIG"))
      .getOrElse("/etc/graft/config.yaml")
    val cfg = Config.load(cfgPath)
    val sourcePath = args.lift(1)
      .orElse(sys.env.get("GRAFT_SOURCE_PATH"))
      .getOrElse(sys.error("GRAFT_SOURCE_PATH (or arg 2) is required"))
    val checkpointDir = args.lift(2)
      .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR"))
      .getOrElse(s"/var/lib/graft/checkpoints/${cfg.serverId}")
    val trigger = sys.env.getOrElse("GRAFT_TRIGGER", "available-now") match {
      case s if s.startsWith("continuous:") =>
        Trigger.ProcessingTime(s.stripPrefix("continuous:"))
      case _ => Trigger.AvailableNow()
    }

    // master comes from spark-submit / the k8s operator; local[*] only
    // as a bare-JVM fallback so `java -cp ... graft.cdc.Main` also runs
    val builder = SparkSession.builder().appName(s"graft-cdc-${cfg.serverId}")
    val spark = (if (sys.props.contains("spark.master") ||
        sys.env.contains("SPARK_MASTER")) builder
      else builder.master(sys.env.getOrElse("GRAFT_LOCAL_MASTER", "local[*]")))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .getOrCreate()
    if (cfg.loggerLevel.nonEmpty)
      spark.sparkContext.setLogLevel(cfg.loggerLevel.toUpperCase)

    val obs = new ObservabilityServer(cfg.serverId, port = cfg.apiPort)
    obs.attach(spark)
    val port = obs.start()
    println(s"[graft-cdc] server=${cfg.serverId} api=:$port " +
      s"shard=${cfg.shardIndex}/${cfg.shardCount} source=$sourcePath")
    try CdcPipeline.syncSupervised(spark, cfg, sourcePath, checkpointDir,
      trigger = trigger)
    finally { obs.stop(); spark.stop() }
  }
}
