package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 alternating A/B for the LabelProp distributed round flip (join
  * labels on the edge's dst v → join on the bucket key u, aggregate to
  * v — both-orientations symmetry). OLD is the pre-r15 round body
  * verbatim over the same bucketed landing; NEW comes from SparkEntry
  * (q139). Gates are disabled via spark.graft.labelprop.localEdgeMax=-1
  * so the probe exercises the DISTRIBUTED loop at any scale.
  * Usage: runMain graft.tools.LabelPropProbe [sfDir] [reps]
  */
object LabelPropProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf5")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-labelprop-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.labelprop.localEdgeMax", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def oldDistributed(dir: DataFrame, rounds: Int): DataFrame = {
      var labels = dir.select(col("u").as("v")).distinct()
        .withColumn("lbl", col("v"))
        .localCheckpoint(true)
      var r = 0
      while (r < rounds) {
        labels = dir
          .join(labels, Seq("v"))
          .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("u"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("w"))
          .select(col("u").as("v"), (-col("w.nl")).as("lbl"))
          .localCheckpoint(true)
        r += 1
      }
      labels.select(col("v"), col("lbl").as("community"))
    }

    def oldQ139(): DataFrame =
      oldDistributed(
          graft.queries.AnalyticsQueries.coEdges(spark, sfDir)
            .select(col("u"), col("v")), rounds = 3)
        .groupBy(col("community"))
        .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .filter(col("n_members") >= 2)
        .orderBy(col("n_members").desc, col("community"))
        .limit(20)
    def newQ139(): DataFrame =
      graft.SparkEntry.queries("q139_label_prop")(spark, sfDir)

    val a = oldQ139().collect().map(_.toString).sorted
    val b = newQ139().collect().map(_.toString).sorted
    require(a.sameElements(b), s"old/new q139 diverge: ${a.length} vs ${b.length}")
    println(s"[lp] old == new (${a.length} rows)")

    def time(mk: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      org.apache.spark.sql.graftbridge.Bridge.renderSort(mk)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, ts: Seq[Double]): Unit = {
      val s = ts.sorted
      println(f"[lp] $name%-10s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    time(oldQ139()); time(newQ139())
    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to reps).foreach { _ => as += time(oldQ139()); bs += time(newQ139()) }
    report("q139_old", as.result()); report("q139_new", bs.result())
    spark.stop()
  }
}
