package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r14 alternating A/B for the q112/q127 Count-Min shared-pass rewrite
  * (sketch linearity: build(raw, w=1) ≡ build(perKeyCounts, w=cnt)).
  * Forms run INTERLEAVED (A,B,A,B,…) in one session so host-mode drift
  * (BASELINE.md r14 first-capture caveat: 128 µs/wakeup flapping)
  * cancels instead of biasing whichever form ran second. Reports
  * best + median per form. Usage:
  *   runMain graft.tools.CmProbe [sfDir] [reps]
  */
object CmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cm-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.CountMin

    // OLD q112 form (pre-r14, verbatim): two lineitem scans, raw-row explode
    def oldQ112(s: SparkSession, d: String): DataFrame = {
      val li = Tables.lineitem(s, d)
      val sketch = CountMin.build(li, col("l_suppkey"), lit(1L))
      val top = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("l_suppkey")).limit(10)
      CountMin.estimate(sketch, top, "l_suppkey")
        .select(col("l_suppkey"), col("exact_cnt"), col("cm_est"))
        .orderBy(col("exact_cnt").desc, col("l_suppkey"))
    }
    // OLD q127 form (pre-r14, verbatim)
    def oldQ127(s: SparkSession, d: String): DataFrame = {
      val hist = s.read.parquet(graft.queries.StatQueries.storedCmSketch(s, d))
      val delta = CountMin.build(
        Tables.lineitem(s, d).filter(col("l_orderkey") % 5 === 0),
        col("l_suppkey"), lit(1L))
      val sketch = CountMin.merge(hist, delta)
      val top = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("l_suppkey")).limit(10)
      CountMin.estimate(sketch, top, "l_suppkey")
        .select(col("l_suppkey"), col("exact_cnt"), col("cm_est"))
        .orderBy(col("exact_cnt").desc, col("l_suppkey"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(mk: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      noop(org.apache.spark.sql.graftbridge.Bridge.renderSort(mk))
      (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, ts: Seq[Double]): Unit = {
      val s = ts.sorted
      println(f"[cm] $name%-14s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    // q127 shared-pass WITHOUT the eager checkpoint: the perKey subtree
    // is computed once per consumer (twice), but no extra materialize
    // job boundary — A/Bs the checkpoint cost on job-latency-heavy hosts
    def q127NoCkpt(s: SparkSession, d: String): DataFrame = {
      val hist = s.read.parquet(graft.queries.StatQueries.storedCmSketch(s, d))
      val perKey = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("exact_cnt"),
          sum(when(col("l_orderkey") % 5 === 0, 1L).otherwise(0L))
            .as("delta_cnt"))
      val delta = CountMin.build(perKey.filter(col("delta_cnt") > 0),
        col("l_suppkey"), col("delta_cnt"))
      val sketch = CountMin.merge(hist, delta)
      val top = perKey
        .orderBy(col("exact_cnt").desc, col("l_suppkey")).limit(10)
      CountMin.estimate(sketch, top, "l_suppkey")
        .select(col("l_suppkey"), col("exact_cnt"), col("cm_est"))
        .orderBy(col("exact_cnt").desc, col("l_suppkey"))
    }

    val pairs: Seq[(String, () => DataFrame, String, () => DataFrame)] = Seq(
      ("q112_old", () => oldQ112(spark, sfDir),
        "q112_new", () => graft.SparkEntry.queries("q112_countmin_heavy")(spark, sfDir)),
      ("q127_old", () => oldQ127(spark, sfDir),
        "q127_new", () => graft.SparkEntry.queries("q127_countmin_incremental")(spark, sfDir)),
      ("q127_old2", () => oldQ127(spark, sfDir),
        "q127_nockpt", () => q127NoCkpt(spark, sfDir)))

    pairs.foreach { case (an, a, bn, b) =>
      time(a()); time(b()) // cold codegen for both
      val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
      (1 to reps).foreach { _ => as += time(a()); bs += time(b()) }
      report(an, as.result()); report(bn, bs.result())
    }
    spark.stop()
  }
}
