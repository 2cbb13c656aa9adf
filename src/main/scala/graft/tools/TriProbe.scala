package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}
import graft.Tables
import graft.operators.CoOccur

/** r14 A/B: q115 triangle counting — whatever Triangles.count at HEAD
  * declares (first the edge-iterator replacing the wedge closure join;
  * then the SortedIntersectCount codegen kernel replacing
  * size(array_intersect)) vs the FROZEN array_intersect edge-iterator
  * body below, so each cut is measured against the previous committed
  * shape. Same orientation, same exact count, equality-gated.
  * Interleaved A,B,A,B. Usage: runMain graft.tools.TriProbe [sfDir] [reps]
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tri-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(s: SparkSession, d: String): DataFrame = {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 8 === 0)
      CoOccur.pairs(li, "l_orderkey", "l_partkey")
    }

    // the committed operator
    def committed(s: SparkSession, d: String): DataFrame =
      graft.operators.Triangles.count(edges(s, d), "a", "b")

    // frozen array_intersect edge-iterator (the first r14 cut's shape)
    def edgeIter(s: SparkSession, d: String): DataFrame = {
      val e = edges(s, d)
      val e0 = e
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true)
      val deg = e0.select(col("a").as("v"))
        .unionAll(e0.select(col("b").as("v")))
        .groupBy(col("v")).agg(cnt(lit(1)).as("d"))
      val oriented = e0
        .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
        .select(
          when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
            col("a")).otherwise(col("b")).as("u"),
          when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
            col("b")).otherwise(col("a")).as("w"))
        .localCheckpoint(true)
      val adj = oriented.groupBy(col("u"))
        .agg(sort_array(collect_list(col("w"))).as("nbrs"))
      val tris = oriented
        .join(adj, Seq("u"), "inner")
        .join(adj.select(col("u").as("w"), col("nbrs").as("nbrs_w")),
          Seq("w"), "left")
        .select(size(array_intersect(col("nbrs"),
          coalesce(col("nbrs_w"),
            array().cast("array<bigint>")))).cast("long").as("t"))
        .agg(sum(col("t")).as("n_triangles"))
      val nv = deg.agg(cnt(lit(1)).as("n_vertices"))
      val ne = e0.agg(cnt(lit(1)).as("n_edges"))
      nv.crossJoin(ne).crossJoin(tris)
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
      println(f"[tri] $name%-10s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    // answers must match before timing means anything
    val a = committed(spark, sfDir).collect().toSeq
    val b = edgeIter(spark, sfDir).collect().toSeq
    require(a.toString == b.toString,
      s"committed=$a vs frozen=$b diverge")
    println(s"[tri] committed=$a frozen=$b match=true")

    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to reps).foreach { _ =>
      as += time(committed(spark, sfDir)); bs += time(edgeIter(spark, sfDir))
    }
    report("committed", as.result()); report("aintersect", bs.result())
    spark.stop()
  }
}
