package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r14 alternating A/B for the q134 PIT rewrite (entity SMJ + range
  * residual → Scd2.asOfSameSource window form). OLD is the pre-r14
  * query body verbatim; NEW comes from SparkEntry so the probe keeps
  * measuring whatever HEAD declares. Interleaved A,B,A,B in one
  * session so host-mode drift cancels (the CmProbe protocol); result
  * equality is asserted before any timing.
  * Usage: runMain graft.tools.PitProbe [sfDir] [reps]
  */
object PitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pit-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def oldQ134(s: SparkSession, d: String): DataFrame = {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate").as("t"),
        col("o_orderstatus").as("status"))
      val dim = graft.operators.Scd2.build(o, "o_custkey", "t",
        "o_orderkey", "status")
      val facts = Tables.orders(s, d).select(
        col("o_custkey").as("f_cust"), col("o_orderkey").as("f_ok"),
        col("o_orderdate").as("f_t"))
      facts.join(dim,
          col("f_cust") === col("o_custkey") &&
            col("eff_from") <= col("f_t") &&
            (col("eff_to").isNull || col("eff_to") > col("f_t")))
        .groupBy(col("status"), col("version"))
        .agg(count(lit(1)).as("n_facts"),
          min(col("f_ok")).as("min_ok"), max(col("f_ok")).as("max_ok"))
        .orderBy(col("status"), col("version"))
    }
    def newQ134(): DataFrame =
      graft.SparkEntry.queries("q134_scd2_pit")(spark, sfDir)

    // plan artifacts for plans/r14 (render-sorted, the bench's shape)
    sys.env.get("PIT_PLAN_DIR").foreach { dir =>
      def planOf(df: DataFrame): String =
        org.apache.spark.sql.graftbridge.Bridge.renderSort(df)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/q134_scd2_pit_before.txt"),
        planOf(oldQ134(spark, sfDir)))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/q134_scd2_pit_after.txt"),
        planOf(newQ134()))
      println(s"[pit] plans written to $dir")
    }

    // equality gate before timing: the two shapes must agree row-for-row
    val a = oldQ134(spark, sfDir).collect().map(_.toString).sorted
    val b = newQ134().collect().map(_.toString).sorted
    require(a.sameElements(b),
      s"old/new q134 diverge: ${a.length} vs ${b.length} rows")
    println(s"[pit] old == new (${a.length} rows)")

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
      println(f"[pit] $name%-10s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    time(oldQ134(spark, sfDir)); time(newQ134())
    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to reps).foreach { _ =>
      as += time(oldQ134(spark, sfDir)); bs += time(newQ134())
    }
    report("q134_old", as.result()); report("q134_new", bs.result())
    spark.stop()
  }
}
