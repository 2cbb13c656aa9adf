package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 above-gate evidence (verdict item 3): at a ≥50× corpus the
  * co-purchase graph exceeds the 4 M-directed-edge local gates, so the
  * catalog graph queries run their DISTRIBUTED loops — this tool dumps
  * the directed edge count and q118's executed distributed plan so the
  * committed artifact can show the bucketed edge side staying
  * exchange-free inside the iteration (the PageRankBucketedSpec pin,
  * demonstrated on the real catalog query at the real scale).
  * Usage: runMain graft.tools.GraphGateProbe [sfDir] [planOut]
  */
object GraphGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf5")
    val planOut = args.lift(1).getOrElse("/tmp/q118_plan_sf5.txt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-graph-gate-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q118_pagerank")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(planOut), plan)
    println(s"[gate] q118 plan written to $planOut " +
      s"(LocalTableScan present: ${plan.contains("LocalTableScan")}, " +
      s"bucketed scan: ${plan.contains("Bucketed: true")})")
    // directed edge count of the same graph (the gate's measure)
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 8 === 0)
    val n = graft.operators.PageRank.directedEdges(
      graft.operators.CoOccur.pairs(li, "l_orderkey", "l_partkey")
        .withColumn("w", lit(1L)), "a", "b", Some("w")).count()
    println(s"[gate] directed edges: $n (gate threshold 4000000)")
    spark.stop()
    sys.exit(0)
  }
}
