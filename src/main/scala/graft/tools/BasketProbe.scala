package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.CoOccur

/** One-shot evidence probe for q121_basket_lift (VERDICT r9 item 1):
  * decomposes the 1.3 s warm time into its stages — basket build /
  * checkpoint, pair explode, pair aggregation, the downstream lift
  * joins — and A/Bs the candidate levers:
  *   (a) apriori item pruning (drop items with corpus support < the
  *       pair floor BEFORE pair generation — answer-identical);
  *   (b) packed-long pair encoding (one BIGINT instead of a 2-field
  *       struct through the explode + shuffle + agg);
  *   (c) fused c_a/n_orders broadcast (one dim build instead of three).
  * Findings land in BASELINE.md §round-10.
  *
  * Usage: runMain graft.tools.BasketProbe [sfDir] [runs]
  */
object BasketProbe {

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
      .master("local[16]")
      .appName("graft-basket-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(name: String, t: Double): Unit =
      println(f"[basket] $name%-42s ${t}%.3f s")

    val li = Tables.lineitem(spark, sfDir)

    // stage decomposition
    report("baskets build (no checkpoint) noop",
      warmBest(runs)(noop(CoOccur.baskets(li, "l_orderkey", "l_partkey",
        materialize = false))))
    report("baskets build + eager checkpoint",
      warmBest(runs)(CoOccur.baskets(li, "l_orderkey", "l_partkey").unpersist()))
    val b = CoOccur.baskets(li, "l_orderkey", "l_partkey")
    val pairRows = CoOccur.pairsFromBaskets(b).count()
    val distinctPairs = CoOccur.pairsFromBaskets(b).distinct().count()
    println(s"[basket] pair rows: $pairRows, distinct pairs: $distinctPairs")
    report("pairs explode only (struct) noop",
      warmBest(runs)(noop(CoOccur.pairsFromBaskets(b))))
    report("pairs explode+agg+floor (struct) noop",
      warmBest(runs)(noop(CoOccur.pairsFromBaskets(b)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3))))

    // (b) packed-long pair stream: same C(k,2) in-row generation, one
    // BIGINT per pair instead of a struct
    def packedPairs(bs: DataFrame): DataFrame =
      bs.select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> x * 2097152 + y)))")).as("pk"))
    report("pairs explode only (packed) noop",
      warmBest(runs)(noop(packedPairs(b))))
    report("pairs explode+agg+floor (packed) noop",
      warmBest(runs)(noop(packedPairs(b)
        .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3))))

    // (a) apriori pruning: items below the pair floor can't be in a
    // surviving pair; measure how much it shrinks THIS fixture
    val ca = b.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
    val nItems = ca.count()
    val nInfrequent = ca.filter(col("c") < 3).count()
    println(s"[basket] items: $nItems, below pair floor (<3): $nInfrequent")

    // (d) explicit stage width: the bench session runs 4 shuffle
    // partitions (right for the catalog's tiny exchanges, wrong for
    // this query's two big aggs) — A/B the explicit keyed repartition
    // the compute-heavy family already uses (Tables.spread pattern)
    val p = spark.sparkContext.defaultParallelism
    report(s"baskets build, $p-wide (repartition)",
      warmBest(runs)(noop(li.repartition(p, col("l_orderkey"))
        .groupBy(col("l_orderkey").as("g"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps")))))
    val bWide = li.repartition(p, col("l_orderkey"))
      .groupBy(col("l_orderkey").as("g"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .localCheckpoint(true)
    report(s"pairs explode+agg+floor, $p-wide",
      warmBest(runs)(noop(CoOccur.pairsFromBaskets(bWide)
        .repartition(p, col("a"), col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3))))

    // (c) the declared query, end to end
    report("query: q121 as declared",
      warmBest(runs)(noop(
        graft.SparkEntry.queries("q121_basket_lift")(spark, sfDir))))

    spark.stop()
  }
}
