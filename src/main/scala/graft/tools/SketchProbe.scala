package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r14 decomposition of q142 (quantile sketch + exact twin — the
  * catalog's largest engine absolute at sf0.1, 1.8 s vs DuckDB 12 s):
  * which stage owns the time?
  *
  *   scan_kstr   : spread scan + kstr concat, no sketch (input floor)
  *   sketch_only : bottomK WindowGroupLimit top-128/group
  *   est_only    : sketch + per-group order-statistic estimates
  *   exact_only  : (g, usd) histogram + cumulative windows + pick
  *   full        : the declared query (join of both sides)
  *
  * Session matches the BENCH config (shuffle 4, AQE off) so numbers
  * compose with bench.sh artifacts. Usage:
  *   runMain graft.tools.SketchProbe [sfDir] [runs]
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sketch-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best(name: String)(mk: => DataFrame): Unit = {
      noop(mk) // cold
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-12s best ${ts.min}%.3f  mean ${ts.sum / ts.size}%.3f")
    }

    def li: DataFrame = Tables.spread(Tables.lineitem(spark, sfDir).select(
        col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber")))
      .select(col("l_returnflag").as("g"),
        floor(col("l_extendedprice")).cast("long").as("usd"),
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("kstr"))

    def sketch: DataFrame =
      graft.operators.QuantileSketch.bottomK(li, "g", "usd", "kstr", k = 128)

    def exact: DataFrame = {
      val cw = Window.partitionBy(col("g")).orderBy(col("usd"))
      val nw = Window.partitionBy(col("g"))
      val cum = li.groupBy(col("g"), col("usd")).agg(count(lit(1)).as("c"))
        .withColumn("hi", sum(col("c")).over(cw))
        .withColumn("n", sum(col("c")).over(nw))
      def pick(p: Double) =
        min(when(col("hi") >= ceil(lit(p) * col("n")).cast("long"),
          col("usd")))
      cum.groupBy(col("g"))
        .agg(pick(0.5).as("ex_p50"), pick(0.95).as("ex_p95"))
    }

    best("scan_kstr")(li)
    best("sketch_only")(sketch)
    best("est_only")(graft.operators.QuantileSketch.estimates(
      sketch, "g", Seq("est_p50" -> 0.5, "est_p95" -> 0.95)))
    best("exact_only")(exact)
    best("full")(graft.SparkEntry.queries("q142_quantile_sketch")(spark, sfDir))
    spark.stop()
  }
}
