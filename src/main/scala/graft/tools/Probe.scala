package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: print schema + count of every testdata table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"=== $t (${df.count()} rows)")
        df.printSchema()
        df.show(3, truncate = 60)
      } catch {
        case e: Throwable => println(s"=== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
