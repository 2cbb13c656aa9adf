package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan audit artifact: the formatted physical plan of every declared
  * query (as the bench executes it, renderSort included), one file.
  * Reviewed per round for the scale properties PlanSpec pins on the
  * headline queries — pushdown reaching the scan, pruned read schemas,
  * broadcast dims, no stray CartesianProduct/global-sort stages.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outPath = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val sb = new StringBuilder
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val body =
          try org.apache.spark.sql.graftbridge.Bridge.renderSort(fn(spark, sfDir))
            .queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
        sb.append(s"==== $name ====\n").append(body).append('\n')
      }
      Files.writeString(Paths.get(outPath), sb.toString)
      println(s"[explain] wrote $outPath")
    } finally {
      spark.stop()
      sys.exit(0) // non-daemon pools must not keep the forked JVM alive
    }
  }
}
