package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{CountFloor, TextDedup}

/** r12 verdict item 7: does the CountFloor saturating-sketch pre-kill
  * generalize beyond q121? A/B on the two suggested adopters, same
  * session, answers cross-checked before timing.
  *
  *  q32 (ngram-Jaccard pair aggregation): the surviving pairs need
  *    inter ≥ ceil(J·(n1+n2)/(1+J)) ≥ ceil(0.4614·n_min) — pairs whose
  *    shared-shingle count can't reach min(cap, that floor) die before
  *    the (d1,d2) exchange. Build pass: one re-read of the
  *    h-partitioned checkpointed shingle stream per side + the self
  *    join re-run (the same stream the plain plan aggregates — the
  *    r12 q121 lesson says THIS is where the pre-kill usually loses).
  *
  *  q97 (source-overlap self-join): a span hash appearing ONCE in the
  *    distinct (source, h) set can't produce a pair — floor=2 kills it
  *    on both join sides. Build pass: one narrow re-read of the
  *    checkpointed span set.
  *
  * Usage: runMain graft.tools.PrekillProbe [sfDir] [runs]
  */
object PrekillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prekill-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Canon.ratio1e4

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // ---- q32 fixture (the query's own bound + checkpoint discipline)
    val mx = Tables.documents(spark, sfDir).agg(max(col("doc_id"))).head().getLong(0)
    val bound = math.max(2000L, (mx + 1L) / 5L)
    val docs = Tables.spread(
      Tables.documents(spark, sfDir).filter(col("doc_id") < bound))
    val sh = TextDedup.shingleHashes(docs)
      .repartition(spark.sparkContext.defaultParallelism, col("h"))
      .localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val nMin = sizes.agg(min(col("n"))).head().getLong(0)
    // inter floor for a surviving pair: i >= J(n1+n2)/(1+J), J=0.29995
    val interFloor = math.min(7L,
      math.ceil(0.29995 / 1.29995 * 2.0 * nMin).toLong).toInt
    println(s"[prekill] q32 n_min=$nMin -> usable inter floor=$interFloor")

    def pairProbe: DataFrame = {
      val a = sh.join(broadcast(sizes), "doc_id")
        .select(col("doc_id").as("d1"), col("h"), col("n").as("n1"))
      val b = sh.join(broadcast(sizes), "doc_id")
        .select(col("doc_id").as("d2"), col("h").as("h2"), col("n").as("n2"))
      a.join(b, col("h") === col("h2") && col("d1") < col("d2") &&
        least(col("n1"), col("n2")) * 100000L >=
          greatest(col("n1"), col("n2")) * 29995L)
        .select(col("d1"), col("d2"), col("n1"), col("n2"))
    }
    def q32Finish(pairs: DataFrame): DataFrame = pairs
      .repartition(spark.sparkContext.defaultParallelism, col("d1"), col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .select(col("d1"), col("d2"),
        ratio1e4(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double")).as("jacc_1e4"))
      .filter(col("jacc_1e4") >= 3000)

    def q32Plain(): DataFrame = q32Finish(pairProbe)
    def q32Prekill(): DataFrame = {
      val keyed = pairProbe.withColumn("pk",
        col("d1") * 4294967296L + col("d2"))
      val nPairs = math.max(1L, keyed.count())
      val sk = CountFloor.sketch(keyed, "pk",
        math.min(nPairs, CountFloor.maxKeysFor()))
      q32Finish(keyed.filter(CountFloor.atLeast(sk, col("pk"), interFloor))
        .drop("pk"))
    }

    // ---- q97 fixture
    val allDocs = Tables.spread(Tables.documents(spark, sfDir))
    val sp = allDocs.select(col("source"), explode(
        graft.functions.TokenSpanHashes.tokenSpanHashes(
          TextDedup.toks(col("text")), 5)).as("h"))
      .distinct()
      .repartition(spark.sparkContext.defaultParallelism, col("h"))
      .localCheckpoint(true)
    def q97Finish(spp: DataFrame): DataFrame = {
      val a = spp.select(col("source").as("source_a"), col("h"))
      val b = spp.select(col("source").as("source_b"), col("h").as("h2"))
      a.join(b, col("h") === col("h2") && col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared"))
    }
    def q97Plain(): DataFrame = q97Finish(sp)
    def q97Prekill(): DataFrame = {
      val nRows = math.max(1L, sp.count())
      val sk = CountFloor.sketch(sp, "h",
        math.min(nRows, CountFloor.maxKeysFor()))
      q97Finish(sp.filter(CountFloor.atLeast(sk, col("h"), 2)))
    }

    // answer identity gates
    val a32 = q32Plain().orderBy(col("d1"), col("d2")).collect().map(_.toString).toSeq
    val b32 = q32Prekill().orderBy(col("d1"), col("d2")).collect().map(_.toString).toSeq
    require(a32 == b32, s"q32 prekill diverges: ${a32.size} vs ${b32.size}")
    val a97 = q97Plain().orderBy(col("source_a"), col("source_b")).collect().map(_.toString).toSeq
    val b97 = q97Prekill().orderBy(col("source_a"), col("source_b")).collect().map(_.toString).toSeq
    require(a97 == b97, s"q97 prekill diverges: ${a97.size} vs ${b97.size}")
    println(s"[prekill] answers identical (q32 ${a32.size} pairs, q97 ${a97.size} source pairs)")

    val shapes: Seq[(String, () => Unit)] = Seq(
      "q32_plain" -> (() => noop(q32Plain())),
      "q32_prekill" -> (() => noop(q32Prekill())),
      "q97_plain" -> (() => noop(q97Plain())),
      "q97_prekill" -> (() => noop(q97Prekill())))
    shapes.foreach { case (n, f) =>
      println(f"[prekill] $n cold: ${time(f())}%.3f s") }
    val best = collection.mutable.Map.empty[String, Double]
    (1 to runs).foreach { r =>
      shapes.foreach { case (n, f) =>
        val t = time(f())
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
        println(f"[prekill] $n round $r: $t%.3f s")
      }
    }
    println("[prekill] best: " + shapes.map { case (n, _) =>
      f"$n=${best(n)}%.3f" }.mkString(" "))
    spark.stop()
  }
}
