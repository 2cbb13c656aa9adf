package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure Catalyst's size estimate for the q76 probe side at each SF —
  * the input to SketchFilter.bloomSemiAuto's cost gate (threshold must
  * separate bench scale, where the sketch-build pass loses, from real
  * scale, where probe-shuffle volume dominates). */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("stats-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = graft.Tables.spread(graft.Tables.documents(spark, d))
      val evalSpans = graft.operators.TextDedup
        .spanHashes(docs.filter(col("doc_id") % 10 === 7), 5)
      val plain = evalSpans.queryExecution.optimizedPlan.stats.sizeInBytes
      val ckpt = evalSpans.localCheckpoint(eager = true)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      println(s"PROBE $sf plain=$plain ckpt=$ckpt rows=${evalSpans.count()}")
    }
    spark.stop()
  }
}
