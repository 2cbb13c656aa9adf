package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q143 KL-mixture decomposition (r13): where does the row's time go —
  * the tokenize+explode scan, the token aggregation, or the dim passes?
  * Same-session interleaved warm best-of-N.
  *
  *   tok_scan_str  : explode string tokens, xxhash-fold only (no agg)
  *   tok_scan_hash : explode StrPolyHash token hashes (long), fold only
  *   agg_str       : groupBy(token string) count → vocab rows
  *   agg_hash      : groupBy(token hash) count → vocab rows
  *   q143          : the full fused query as shipped
  *
  * Usage: runMain graft.tools.KlProbe [sfDir] [runs]
  */
object KlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-kl-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def strToks: DataFrame = Tables.documents(spark, sfDir)
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        x => x =!= "")).as("t"))
    def hashToks: DataFrame = Tables.documents(spark, sfDir)
      .select(explode(
        graft.operators.TextDedup.tokenHashes(col("text"))).as("t"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // full-query variants, interleaved in ONE session
    def unfused(): DataFrame = {
      val toks = Tables.documents(spark, sfDir).select(col("source"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          x => x =!= "")).as("t"))
      val cst = toks.groupBy(col("source"), col("t"))
        .agg(count(lit(1)).as("c_st"))
      val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"),
        count(lit(1)).as("n_types"))
      val cgt = cst.groupBy(col("t")).agg(sum(col("c_st")).as("c_gt"))
      val ng = cgt.agg(sum(col("c_gt")).as("n_g"))
      val term = cst.join(cgt, "t").join(broadcast(ns), "source")
        .crossJoin(broadcast(ng))
        .select(col("source"),
          floor((col("c_st").cast("double") / col("n_s").cast("double")) *
            log((col("c_st") * col("n_g")).cast("double") /
              (col("n_s") * col("c_gt")).cast("double")) *
            1000000.0).cast("long").as("term_1e6"))
      term.groupBy(col("source")).agg(sum(col("term_1e6")).as("kl_1e6"))
        .join(broadcast(ns), "source")
        .select(col("source"), col("n_s").as("n_tokens"), col("n_types"),
          col("kl_1e6"))
        .orderBy(col("source"))
    }

    def fused(oneStage: Boolean): DataFrame = {
      val srcs = Tables.documents(spark, sfDir).select(col("source")).distinct()
        .orderBy(col("source")).collect().map(_.getString(0)).toIndexedSeq
      val k = srcs.size
      val siCol = srcs.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, (src, i)) => when(col("source") === src, lit(i)).otherwise(acc)
      }
      val toks = Tables.documents(spark, sfDir).withColumn("si", siCol)
        .select(col("si"),
          explode(filter(split(lower(col("text")), "[^a-z]+"),
            x => x =!= "")).as("t"))
      val dim0 =
        if (oneStage)
          toks.groupBy(col("t")).agg(
            count(when(col("si") === 0, 1)).as("c_0"),
            (1 until k).map(i =>
              count(when(col("si") === i, 1)).as(s"c_$i")) :+
              count(lit(1)).as("c_gt"): _*)
        else {
          val cst = toks.groupBy(col("t"), col("si")).agg(count(lit(1)).as("c"))
          cst.groupBy(col("t")).agg(
            sum(when(col("si") === 0, col("c")).otherwise(0L)).as("c_0"),
            (1 until k).map(i =>
              sum(when(col("si") === i, col("c")).otherwise(0L)).as(s"c_$i")) :+
              sum(col("c")).as("c_gt"): _*)
        }
      val dim = dim0.localCheckpoint()
      val tot = dim.agg(
        sum(col("c_0")).as("n_0"),
        ((1 until k).map(i => sum(col(s"c_$i")).as(s"n_$i")) ++
          (0 until k).map(i =>
            count(when(col(s"c_$i") > 0, 1)).as(s"v_$i")) :+
          sum(col("c_gt")).as("n_g")): _*)
      val sums = dim.crossJoin(broadcast(tot)).agg(
        sum(when(col("c_0") > 0,
          floor((col("c_0").cast("double") / col("n_0").cast("double")) *
            log((col("c_0") * col("n_g")).cast("double") /
              (col("n_0") * col("c_gt")).cast("double")) *
            1000000.0).cast("long")).otherwise(0L)).as("kl_0"),
        (1 until k).map(i =>
          sum(when(col(s"c_$i") > 0,
            floor((col(s"c_$i").cast("double") / col(s"n_$i").cast("double")) *
              log((col(s"c_$i") * col("n_g")).cast("double") /
                (col(s"n_$i") * col("c_gt")).cast("double")) *
              1000000.0).cast("long")).otherwise(0L)).as(s"kl_$i")): _*)
        .crossJoin(broadcast(tot))
      val stackArgs = (0 until k).map { i =>
        val q = srcs(i).replace("'", "''")
        s"'$q', n_$i, v_$i, kl_$i"
      }.mkString(", ")
      sums.select(expr(
          s"stack($k, $stackArgs) AS (source, n_tokens, n_types, kl_1e6)"))
        .orderBy(col("source"))
    }

    val a = unfused().collect().map(_.toString).toSeq
    val b1 = fused(oneStage = true).collect().map(_.toString).toSeq
    val b2 = fused(oneStage = false).collect().map(_.toString).toSeq
    require(a == b1 && a == b2, s"variants diverge:\n$a\n$b1\n$b2")
    println("[kl-probe] all three variants produce identical rows")

    val shapes: Seq[(String, () => Unit)] = Seq(
      "tok_scan_str" -> (() => noop(
        strToks.select(xxhash64(col("t")).as("h")).agg(expr("bit_xor(h)")))),
      "tok_scan_hash" -> (() => noop(
        hashToks.agg(expr("bit_xor(t)")))),
      "agg_str" -> (() => noop(
        strToks.groupBy(col("t")).agg(count(lit(1)).as("c")))),
      "agg_str_rowfilter" -> (() => noop(
        Tables.documents(spark, sfDir)
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("t"))
          .where(col("t") =!= "")
          .groupBy(col("t")).agg(count(lit(1)).as("c")))),
      "unfused" -> (() => noop(unfused())),
      "fused_one" -> (() => noop(fused(oneStage = true))),
      "fused_two" -> (() => noop(fused(oneStage = false))))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    shapes.foreach { case (n, f) => println(f"[kl-probe] $n cold: ${time(f())}%.3f s") }
    val best = collection.mutable.Map.empty[String, Double]
    (1 to runs).foreach { r =>
      shapes.foreach { case (n, f) =>
        val t = time(f())
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
        println(f"[kl-probe] $n round $r: $t%.3f s")
      }
    }
    println("[kl-probe] best: " + shapes.map { case (n, _) =>
      f"$n=${best(n)}%.3f" }.mkString(" "))
    spark.stop()
  }
}
