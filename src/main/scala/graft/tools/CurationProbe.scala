package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{LineDedup, TableDiff}

/** Stage decomposition for the two round-10 curation queries whose
  * bench ratios exceed 2× (q137 line dedup, q149 diff→apply): times
  * each cumulative prefix of the pipeline so the e2e number can be
  * read as a stage sum — the FloorProbe protocol. Findings land in
  * BASELINE.md.
  *
  * Usage: runMain graft.tools.CurationProbe [sfDir] [runs]
  */
object CurationProbe {

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
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-curation-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(name: String, t: Double): Unit =
      println(f"""{"probe":"$name","sec":$t%.3f}""")

    // ---- q137 stages ----
    val lined = LineDedup.withChunkedLines(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      "text", 8)
    report("q137_a_chunk_scan", warmBest(runs) {
      noop(LineDedup.lineOccurrences(lined)) })
    report("q137_b_checkpoint", warmBest(runs) {
      LineDedup.lineOccurrences(lined).localCheckpoint(true).count(); () })
    report("q137_c_survivors", warmBest(runs) {
      noop(LineDedup.survivors(lined)) })
    report("q137_d_e2e", warmBest(runs) { noop(LineDedup.rebuild(lined)) })

    // ---- q149 stages ----
    val o = Tables.orders(spark, sfDir)
    val older = o.filter(col("o_orderkey") % 10 =!= 3)
    val newer = o.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
    report("q149_a_scan_both", warmBest(runs) { noop(older); noop(newer) })
    report("q149_b_diff", warmBest(runs) {
      noop(TableDiff.diff(older, newer, "o_orderkey")) })
    report("q149_c_changeset", warmBest(runs) {
      noop(TableDiff.changeSet(older, newer, "o_orderkey")) })
    report("q149_d_e2e_apply", warmBest(runs) {
      noop(TableDiff.applyChanges(older,
        TableDiff.changeSet(older, newer, "o_orderkey"), "o_orderkey")) })

    spark.stop()
    sys.exit(0)
  }
}
