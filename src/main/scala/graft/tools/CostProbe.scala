package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r13 decompositions for the two remaining >2×-at-10× rows with
  * sub-second absolutes (r12 verdict item 5):
  *
  *  q83 column-profile — is the row distinct-hash-bound?
  *    scan4      : 4-column pruned scan, no agg (the input floor)
  *    distinct1  : ONE exact countDistinct (the per-distinct cost unit)
  *    onepass    : Profiling.profileOnePass (Expand, the 100 TB form)
  *    percol     : Profiling.profilePerColumn (4 pruned scans)
  *
  *  q61 interval join — does the single-scan window form beat the
  *  two-scan SMJ range join?
  *    q61_join   : the r12 shape (two filtered scans, left range join)
  *    q61_window : ONE scan, range frame [-Gap, -1] conditional count
  *
  * Same-session interleaved warm best-of-N; answers cross-checked for
  * the q61 pair before timing.
  *
  * Usage: runMain graft.tools.CostProbe [sfDir] [runs]
  */
object CostProbe {
  private val GapNs = 30L * 60L * 1000000000L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cost-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val li = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

    def q61Join(): DataFrame = {
      val e = Tables.events(spark, sfDir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("p_event"),
          col("ts").as("pts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
      p.join(c, col("pu") === col("cu") &&
          col("cts") >= col("pts") - lit(GapNs) && col("cts") < col("pts"),
          "left")
        .groupBy(col("pu"), col("p_event"), col("pts"))
        .agg(count(col("cts")).as("n_clicks"))
        .select(col("pu").as("user_id"), col("p_event").as("event_id"),
          col("pts"), col("n_clicks"))
    }

    def q61Window(): DataFrame = {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-GapNs, -1)
      e.withColumn("n_clicks",
          count(when(col("event_type") === "click", 1)).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts").as("pts"),
          col("n_clicks"))
    }

    // answers must match (multiset over the projected columns)
    val a = q61Join().orderBy(col("user_id"), col("event_id"))
      .collect().map(_.toString).toSeq
    val b = q61Window().orderBy(col("user_id"), col("event_id"))
      .collect().map(_.toString).toSeq
    require(a == b, s"q61 shapes diverge: ${a.take(3)} vs ${b.take(3)}" +
      s" (sizes ${a.size}/${b.size})")
    println(s"[cost-probe] q61 join ≡ window (${a.size} rows)")

    val shapes: Seq[(String, () => Unit)] = Seq(
      "q83_scan4" -> (() => noop(li.select(cols.map(col): _*))),
      "q83_distinct1" -> (() => noop(
        li.agg(countDistinct(col("l_orderkey")).as("nd")))),
      "q83_onepass" -> (() => noop(
        graft.operators.Profiling.profileOnePass(li, cols))),
      "q83_percol" -> (() => noop(
        graft.operators.Profiling.profilePerColumn(li, cols))),
      "q61_join" -> (() => noop(q61Join())),
      "q61_window" -> (() => noop(q61Window())))

    shapes.foreach { case (n, f) =>
      println(f"[cost-probe] $n cold: ${time(f())}%.3f s") }
    val best = collection.mutable.Map.empty[String, Double]
    (1 to runs).foreach { r =>
      shapes.foreach { case (n, f) =>
        val t = time(f())
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
        println(f"[cost-probe] $n round $r: $t%.3f s")
      }
    }
    println("[cost-probe] best: " + shapes.map { case (n, _) =>
      f"$n=${best(n)}%.3f" }.mkString(" "))
    spark.stop()
  }
}
