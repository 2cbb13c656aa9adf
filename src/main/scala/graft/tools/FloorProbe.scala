package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Canon, SparkEntry, Tables}
import Canon._

/** One-shot evidence probe for the small-query ratio floor (VERDICT r3
  * item 9): decomposes q11/q21/q24's 0.3–0.4 s warm times into
  * (a) the pure job-launch floor (trivial 2-stage job),
  * (b) the parquet scan cost of their input tables,
  * (c) expression cost deltas (decimal-canon sums vs plain double sums;
  *     get_json_object vs no-extract scan).
  * Findings land in BASELINE.md §"small-query floor".
  *
  * Usage: runMain graft.tools.FloorProbe [sfDir] [runs]
  */
object FloorProbe {

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
      .master("local[32]")
      .appName("graft-floor-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def report(name: String, t: Double): Unit =
      println(f"[floor] $name%-34s ${t}%.3f s")

    // (a) pure scheduling floor: trivial one/two-stage jobs, no IO
    val tiny = spark.range(1000).toDF("x").localCheckpoint(true)
    report("job: 1-stage count", warmBest(runs)(tiny.count()))
    report("job: 2-stage shuffle count",
      warmBest(runs)(tiny.repartition(32, col("x")).groupBy(col("x") % 7).count().count()))

    // (b) scan floors
    val li = Tables.lineitem(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    report("scan: lineitem count", warmBest(runs)(li.count()))
    report("scan: events count", warmBest(runs)(ev.count()))
    report("scan: lineitem 4-col noop", warmBest(runs)(noop(
      li.select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice")))))
    report("scan: events props+value noop", warmBest(runs)(noop(
      ev.select(col("props"), col("value")))))

    // (c) the three floor queries, as declared
    for (q <- Seq("q11_agg_pricing_summary", "q21_math_decimal", "q24_json_funcs"))
      report(s"query: $q", warmBest(runs)(noop(SparkEntry.queries(q)(spark, sfDir))))

    // (d) expression isolations
    // q11 with plain double sums (no decimal canon): decimal cost delta
    report("q11 variant: double sums", warmBest(runs)(noop(
      li.filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))))
    // q24 without the JSON extract (same agg shape on a cheap key)
    report("q24 variant: no json extract", warmBest(runs)(noop(
      ev.groupBy((col("user_id") % 7).as("k"))
        .agg(count(lit(1)).as("n"), dec(sum(dec(col("value")))).cast("double").as("sum_value"))
        .orderBy(col("k")))))
    // q24's json extract alone (narrow, no agg)
    report("q24 variant: extract-only noop", warmBest(runs)(noop(
      ev.select(get_json_object(col("props"), "$.k").cast("long").as("k")))))

    spark.stop()
  }
}
