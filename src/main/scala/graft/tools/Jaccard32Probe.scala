package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r15 stage decomposition of q32_dedup_ngram_jaccard at large scale
  * (verdict item 4 — the formal-retirement ledger): the query is
  *   (1) shingle pass: codegen span-hash kernel + h-repartition +
  *       eager checkpoint,
  *   (2) self-join on h with the exact length-ratio prune,
  *   (3) pair aggregation (packed map-side combine) + jaccard render.
  * This probe times (1) alone, (1)+(2) (join output counted through a
  * cheap sum so the pair agg is excluded), and the full HEAD query —
  * attributing the cost to its stages the way the q83/q138 floor
  * ledgers do. Usage: runMain graft.tools.Jaccard32Probe [sfDir] [reps]
  */
object Jaccard32Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf5")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccard32-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // q32's dedupBound, replicated (DedupQueries.dedupBound is
    // private): max(2000, (max(doc_id)+1)/5)
    val bound = graft.SparkEntry.queries("q32_dedup_ngram_jaccard") // HEAD
    val dBound = {
      val row = Tables.documents(spark, sfDir).agg(max(col("doc_id"))).head()
      val mx = if (row.isNullAt(0)) 0L else row.getLong(0)
      math.max(2000L, (mx + 1L) / 5L)
    }
    println(s"[j32] dedupBound = $dBound")
    def docs: DataFrame = Tables.spread(
      Tables.documents(spark, sfDir).filter(col("doc_id") < dBound))

    def shingleStream: DataFrame =
      graft.operators.TextDedup.shingleHashes(docs).repartition(32, col("h"))

    def time(label: String)(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[j32] $label%-22s $t%.3f s")
      t
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val p = spark.sparkContext.defaultParallelism
    def mkJoined(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.join(broadcast(sizes), "doc_id")
        .select(col("doc_id").as("d1"), col("h"), col("n").as("n1"))
      val b = sh.join(broadcast(sizes), "doc_id")
        .select(col("doc_id").as("d2"), col("h").as("h2"), col("n").as("n2"))
      a.join(b, col("h") === col("h2") && col("d1") < col("d2") &&
        least(col("n1"), col("n2")) * 100000L >=
          greatest(col("n1"), col("n2")) * 29995L)
        .select(col("d1"), col("d2"), col("n1"), col("n2"))
    }
    def render(pairs: DataFrame): DataFrame = pairs
      .select(col("d1"), col("d2"),
        graft.Canon.ratio1e4(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double")).as("jacc_1e4"))
      .filter(col("jacc_1e4") >= 3000)
      .orderBy(col("d1"), col("d2"))
    // current form
    def vA(sh: DataFrame): DataFrame = render(mkJoined(sh)
      .repartition(p, col("d1"), col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2")))
    // plain groupBy: map-side partial agg on the 32 h-partitions,
    // session-width (4) final
    def vB(sh: DataFrame): DataFrame = render(mkJoined(sh)
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2")))
    // packed-long pair key (the q121 discipline): one 8-byte key
    // through the exchange, partial agg kept, unpack after
    def vC(sh: DataFrame): DataFrame = {
      val packed = mkJoined(sh)
        .select((col("d1") * 16777216L + col("d2")).as("k"),
          col("n1"), col("n2"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("inter"),
          first(col("n1")).as("n1"), first(col("n2")).as("n2"))
        .select(expr("k div 16777216").as("d1"),
          pmod(col("k"), lit(16777216L)).cast("long").as("d2"),
          col("inter"), col("n1"), col("n2"))
      render(packed)
    }

    // narrow-shuffle form: the prune still sees n1/n2 (join condition),
    // but only (d1, d2) crosses the pair exchange — sizes re-attach
    // post-agg as two broadcast joins on the distinct-pair stream
    def vE(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val pairs = mkJoined(sh).select(col("d1"), col("d2"))
        .repartition(p, col("d1"), col("d2"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("doc_id").as("d1"), col("n").as("n1"))), "d1")
        .join(broadcast(sizes.select(col("doc_id").as("d2"), col("n").as("n2"))), "d2")
        .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"))
      render(pairs)
    }

    val variantSet: Seq[(String, DataFrame => DataFrame)] =
      sys.env.getOrElse("J32_VARIANTS", "vA,vB,vC,vE").split(",").toSeq.collect {
        case "vA" => "vA_repart_agg" -> (vA _)
        case "vB" => "vB_plain_agg" -> (vB _)
        case "vC" => "vC_packed_agg" -> (vC _)
        case "vE" => "vE_narrow_shuffle" -> (vE _)
      }

    (1 to reps).foreach { r =>
      println(s"[j32] --- rep $r ---")
      time("s1_shingle_stream") { noop(shingleStream) }
      val sh = shingleStream.localCheckpoint(true)
      if (r == 1) {
        val joined = mkJoined(sh)
        val cnt = joined.agg(count(lit(1)).as("n"),
          count_distinct(col("d1"), col("d2")).as("np")).head()
        println(s"[j32] candidates=${cnt.getLong(0)} distinct_pairs=${cnt.getLong(1)}")
        // equality gate: all variants == HEAD
        val ref = vA(sh).collect().map(_.toString).sorted
        for ((n, v) <- variantSet.drop(1)) {
          val got = v(sh).collect().map(_.toString).sorted
          require(ref.sameElements(got), s"$n diverges")
          println(s"[j32] $n == vA (${ref.length} rows)")
        }
      }
      time("s2_selfjoin_stream") {
        mkJoined(sh).select((col("d1") + col("d2")).as("x"))
          .agg(sum(col("x"))).collect()
      }
      for ((n, v) <- variantSet) time(n) { noop(v(sh)) }
      time("s3_full_q32") { noop(
        org.apache.spark.sql.graftbridge.Bridge.renderSort(
          bound(spark, sfDir))) }
    }
    spark.stop()
  }
}
