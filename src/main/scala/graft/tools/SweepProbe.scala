package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{IntervalSweep, SessionPaths}

/** Stage decomposition for q122_max_concurrency (r9 verdict item 3,
  * r10 floor evidence): how much of the query is the shared
  * sessionization (q26's window — independently floor-rated), how much
  * the interval reduction, and how much the two-phase sweep itself —
  * including the range exchange's sampling pass, the one stage a
  * contiguous-slice decomposition cannot avoid.
  *
  * Usage: runMain graft.tools.SweepProbe [sfDir] [runs]
  */
object SweepProbe {

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  private def warmBest(runs: Int)(fn: => Unit): Double =
    (1 to runs).map(_ => time(fn)).min

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-sweep-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def report(name: String, t: Double): Unit =
      println(f"[sweep] $name%-44s ${t}%.3f s")

    val ev = Tables.events(spark, sfDir)
    val gap = 30L * 60L * 1000000000L

    def sessions() = SessionPaths.sessions(ev, "user_id", "ts", "event_id", gap)
    def intervals() = sessions()
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("t0"), (max(col("ts")) + 1).as("t1"))

    report("sessionize only (q26's window) noop",
      warmBest(runs)(noop(sessions())))
    report("sessionize + interval agg noop",
      warmBest(runs)(noop(intervals())))
    val iv = intervals().localCheckpoint(true)
    println(s"[sweep] intervals: ${iv.count()}")
    report("sweep only, on materialized intervals",
      warmBest(runs)(noop(IntervalSweep.maxConcurrent(iv, "t0", "t1"))))
    // the sweep's own pieces over the materialized intervals
    val n = spark.sparkContext.defaultParallelism
    def deltas() = iv.select(col("t0").cast("long").as("t"), lit(1L).as("d"))
      .unionAll(iv.select(col("t1").cast("long").as("t"), lit(-1L).as("d")))
    report("deltas union noop", warmBest(runs)(noop(deltas())))
    report("deltas + range exchange (sampling pass) noop",
      warmBest(runs)(noop(deltas().repartitionByRange(n, col("t"), col("d")))))
    // candidate: slice-local fold via sortWithinPartitions +
    // mapPartitions — no hash(pid) exchange (Catalyst can't see that
    // pid IS the partition), no window materialization; one streaming
    // pass emits ONE summary row per slice
    def foldSweep(ivl: DataFrame): DataFrame = {
      import spark.implicits._
      val deltas = ivl.select(col("t0").cast("long").as("t"), lit(1L).as("d"))
        .unionAll(ivl.select(col("t1").cast("long").as("t"), lit(-1L).as("d")))
      val loc = deltas.repartitionByRange(n, col("t"), col("d"))
        .sortWithinPartitions(col("t"), col("d"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId().toLong
          var run = 0L; var best = Long.MinValue; var bestT = 0L
          var any = false
          for ((t, d) <- it) {
            any = true; run += d
            if (run > best) { best = run; bestT = t }
          }
          if (any) Iterator((pid, best, -bestT, run)) else Iterator.empty
        }
        .toDF("pid", "run", "nt", "tot")
        .localCheckpoint(true)
      val offs = loc.select(col("pid"))
        .join(loc.select(col("pid").as("p2"), col("tot")),
          col("p2") < col("pid"), "left")
        .groupBy(col("pid")).agg(coalesce(sum(col("tot")), lit(0L)).as("off"))
      loc.join(offs, Seq("pid"))
        .select((col("run") + col("off")).as("active"), col("nt"))
        .agg(max(struct(col("active"), col("nt"))).as("s"))
        .select(col("s.active").as("max_concurrent"), (-col("s.nt")).as("at_t"))
    }
    report("sweep via partition fold, on materialized",
      warmBest(runs)(noop(foldSweep(iv))))
    // equality check vs the declared operator
    val a = IntervalSweep.maxConcurrent(iv, "t0", "t1").collect().toSeq
    val c = foldSweep(iv).collect().toSeq
    println(s"[sweep] fold == window sweep: ${a.toString == c.toString} ($a vs $c)")

    report("query: q122 as declared",
      warmBest(runs)(noop(
        graft.SparkEntry.queries("q122_max_concurrency")(spark, sfDir))))
    spark.stop()
  }
}
