package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r15 alternating A/B for the Canon.nsToStr render kernel
  * (date_format∘timestamp_micros∘div chain → NsToStrUtc codegen
  * expression). OLD rebuilds q26/q27 with the pre-r15 chain verbatim;
  * NEW comes from SparkEntry so the probe keeps measuring HEAD.
  * Interleaved A,B,A,B in one session (the CmProbe protocol); result
  * equality asserted before timing.
  * Usage: runMain graft.tools.RenderProbe [sfDir] [reps]
  */
object RenderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-render-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val GapNs = 30L * 60L * 1000000000L
    // the pre-r15 chain, verbatim from Canon (divL via IntegralDivide)
    def oldNsToStr(c: Column): Column =
      date_format(graft.Canon.nsToMicros(c), "yyyy-MM-dd HH:mm:ss")

    def oldQ26(s: SparkSession, d: String): DataFrame = {
      val w1 = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val g = Tables.events(s, d)
        .withColumn("new_s",
          when(col("ts") - lag(col("ts"), 1).over(w1) > GapNs, 1).otherwise(0))
      g.withColumn("sid", sum(col("new_s")).over(
          w1.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ns"), max(col("ts")).as("end_ns"))
        .select(col("user_id"), col("sid"), col("n_events"),
          oldNsToStr(col("start_ns")).as("session_start"),
          oldNsToStr(col("end_ns")).as("session_end"))
        .orderBy(col("user_id"), col("sid"))
    }
    def oldQ27(s: SparkSession, d: String): DataFrame =
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"), col("ts"))
        .agg(min(col("event_id")).as("event_id"))
        .select(col("user_id"), col("event_type"),
          oldNsToStr(col("ts")).as("ts_s"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"), col("ts"))

    def newQ(name: String): DataFrame = graft.SparkEntry.queries(name)(spark, sfDir)

    def gate(name: String, old: DataFrame, nw: DataFrame): Unit = {
      val a = old.collect().map(_.toString).sorted
      val b = nw.collect().map(_.toString).sorted
      require(a.sameElements(b), s"old/new $name diverge: ${a.length} vs ${b.length}")
      println(s"[render] $name old == new (${a.length} rows)")
    }
    gate("q26", oldQ26(spark, sfDir), newQ("q26_session_window"))
    gate("q27", oldQ27(spark, sfDir), newQ("q27_dedup"))

    def time(mk: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      org.apache.spark.sql.graftbridge.Bridge.renderSort(mk)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, ts: Seq[Double]): Unit = {
      val s = ts.sorted
      println(f"[render] $name%-12s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    for ((name, old, nw) <- Seq(
        ("q26", () => oldQ26(spark, sfDir), () => newQ("q26_session_window")),
        ("q27", () => oldQ27(spark, sfDir), () => newQ("q27_dedup")))) {
      time(old()); time(nw())
      val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
      (1 to reps).foreach { _ => as += time(old()); bs += time(nw()) }
      report(s"${name}_old", as.result()); report(s"${name}_new", bs.result())
    }
    spark.stop()
  }
}
