package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Decompose q11-style cost: raw scan vs double agg vs decimal agg. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[scan] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val li = Tables.lineitem(spark, d)
    println(s"[scan] lineitem rows=${li.count()} partitions=${li.rdd.getNumPartitions}")
    time("count")(li.selectExpr("count(*)").collect())
    time("sum_double")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice"))).collect())
    time("sum_decimal_cast")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")),
        sum(col("l_extendedprice").cast("decimal(18,4)"))).collect())
    spark.stop()
  }
}
