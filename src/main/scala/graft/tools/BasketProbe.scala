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

    // (e) the DuckDB shape: distinct + self-equi-join on the order key,
    // no array materialization anywhere. repartition(ok) BEFORE the
    // (ok, pk) distinct: HashPartitioning(ok) satisfies the agg's
    // ClusteredDistribution(ok, pk) AND the join's, so the whole chain
    // runs on ONE exchange (and the two join sides reuse it).
    def selfJoinPairs(): DataFrame = {
      val d0 = li.repartition(p, col("l_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok"), col("pk")).agg(lit(1))
        .select(col("ok"), col("pk"))
      d0.select(col("ok"), col("pk").as("a"))
        .join(d0.select(col("ok"), col("pk").as("b")), Seq("ok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
    }
    report("pairs via distinct+self-join noop",
      warmBest(runs)(noop(selfJoinPairs())))

    // (g) remaining stage decomposition at the declared widths: the
    // item-support pass and the 1-row order count over the checkpoint
    report("item supports (explode+agg) narrow",
      warmBest(runs)(noop(bWide.select(explode(col("ps")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("c")))))
    report(s"item supports (explode+agg) $p-wide",
      warmBest(runs)(noop(bWide.select(explode(col("ps")).as("p"))
        .repartition(p, col("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("c")))))
    report("n_orders 1-row count",
      warmBest(runs)(noop(bWide.agg(count(lit(1)).as("n_orders")))))
    // (h) packed pairs at the declared width, 2^32 radix (safe for any
    // partkey < 2^31, unlike the 2^21 demo radix above)
    def packed32(bs: DataFrame): DataFrame =
      bs.select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> x * 4294967296 + y)))")).as("pk"))
    report(s"pairs packed-2^32 agg+floor $p-wide",
      warmBest(runs)(noop(packed32(bWide)
        .repartition(p, col("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3))))
    report(s"pairs packed-2^32 agg+floor+unpack $p-wide",
      warmBest(runs)(noop(packed32(bWide)
        .repartition(p, col("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
        .select((col("pk") / 4294967296L).cast("long").as("pa"),
          pmod(col("pk"), lit(4294967296L)).as("pb"), col("c_ab")))))

    // (f) full q121 algebra on the self-join shape: c_a and n_orders
    // from the SAME distinct pass (no basket table, no checkpoint)
    def q121SelfJoin(): DataFrame = {
      val d0 = li.repartition(p, col("l_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok"), col("pk")).agg(lit(1))
        .select(col("ok"), col("pk"))
        .localCheckpoint(true)
      val nOrders = d0.agg(countDistinct(col("ok")).as("n_orders"))
      val ca = d0.groupBy(col("pk").as("p")).agg(count(lit(1)).as("c"))
      val pairs = d0.select(col("ok"), col("pk").as("a"))
        .join(d0.select(col("ok"), col("pk").as("b")), Seq("ok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a").as("pa"), col("b").as("pb"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
      pairs
        .join(broadcast(ca.select(col("p").as("pa"), col("c").as("c_a"))), Seq("pa"))
        .join(broadcast(ca.select(col("p").as("pb"), col("c").as("c_b"))), Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("c_ab"),
          graft.Canon.ratio1e4(col("n_orders").cast("double") * col("c_ab").cast("double")
            / (col("c_a").cast("double") * col("c_b").cast("double")))
            .as("lift_1e4"))
        .orderBy(col("lift_1e4").desc, col("pa"), col("pb"))
        .limit(20)
    }
    report("q121 algebra via self-join, e2e",
      warmBest(runs)(noop(q121SelfJoin())))

    // (i) r12 count-floor pre-kill A/B: sketch build + prekilled
    // agg vs the plain packed agg, at the declared widths
    val rawPk = graft.operators.CoOccur.packedPairsFromBaskets(bWide)
    val nPk = rawPk.count()
    println(s"[basket] packed pair rows for prekill A/B: $nPk")
    report("prekill: sketch build only",
      warmBest(runs)({
        val sk = graft.operators.CountFloor.sketch(rawPk, "pk", nPk)
        sk.destroy()
      }))
    report("prekill: sketch+filter+agg+floor e2e",
      warmBest(runs)({
        val sk = graft.operators.CountFloor.sketch(rawPk, "pk", nPk)
        noop(rawPk
          .filter(graft.operators.CountFloor.atLeast(sk, col("pk"), 3))
          .repartition(p, col("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 3))
        sk.destroy()
      }))
    report("prekill: basket-loop sketch build only",
      warmBest(runs)({
        val sk = graft.operators.CountFloor.sketchPackedPairs(bWide, "ps", nPk)
        sk.destroy()
      }))
    report("prekill: basket-loop sketch+filter+agg e2e",
      warmBest(runs)({
        val sk = graft.operators.CountFloor.sketchPackedPairs(bWide, "ps", nPk)
        noop(rawPk
          .filter(graft.operators.CountFloor.atLeast(sk, col("pk"), 3))
          .repartition(p, col("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 3))
        sk.destroy()
      }))
    locally {
      val sk = graft.operators.CountFloor.sketchPackedPairs(bWide, "ps", nPk)
      val kept = rawPk
        .filter(graft.operators.CountFloor.atLeast(sk, col("pk"), 3)).count()
      println(f"[basket] prekill keep rate: $kept of $nPk " +
        f"(${kept.toDouble / nPk}%.4f)")
      report("prekill: filter+agg+floor (sketch prebuilt)",
        warmBest(runs)(noop(rawPk
          .filter(graft.operators.CountFloor.atLeast(sk, col("pk"), 3))
          .repartition(p, col("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 3))))
      sk.destroy()
    }

    // (c) the declared query, end to end — gate-off vs gate-on A/B in
    // the SAME session (the q121 decision row)
    spark.conf.set("spark.graft.basket.prekillMinPairs", Long.MaxValue.toString)
    report("query: q121 prekill OFF",
      warmBest(runs)(noop(
        graft.SparkEntry.queries("q121_basket_lift")(spark, sfDir))))
    spark.conf.set("spark.graft.basket.prekillMinPairs", "0")
    report("query: q121 prekill ON",
      warmBest(runs)(noop(
        graft.SparkEntry.queries("q121_basket_lift")(spark, sfDir))))
    spark.conf.unset("spark.graft.basket.prekillMinPairs")
    report("query: q121 as declared (default gate)",
      warmBest(runs)(noop(
        graft.SparkEntry.queries("q121_basket_lift")(spark, sfDir))))

    spark.stop()
  }
}
