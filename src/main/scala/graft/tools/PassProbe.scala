package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Canon, Tables}

/** r14 alternating A/B for the shared-pass rewrites of q149 (orders
  * checkpointed once for the diff→apply chain), q93/q72/q63 (tokenize
  * once into a checkpointed array frame). OLD forms below are the
  * pre-r14 query bodies verbatim; NEW forms come from SparkEntry, so
  * this probe keeps measuring whatever HEAD declares. Interleaved
  * A,B,A,B in one session so host-mode drift cancels (the CmProbe
  * protocol). Usage: runMain graft.tools.PassProbe [sfDir] [reps]
  */
object PassProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pass-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextDedup
    val P = 1000000007L
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z]+"), x => x =!= "")
    def ratio1e4(c: org.apache.spark.sql.Column) = Canon.ratio1e4(c)

    def oldQ149(s: SparkSession, d: String): DataFrame = {
      val o = Tables.orders(s, d)
      val older = o.filter(col("o_orderkey") % 10 =!= 3)
      val newer = o.filter(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      val rebuilt = graft.operators.TableDiff.applyChanges(older,
        graft.operators.TableDiff.changeSet(older, newer, "o_orderkey"),
        "o_orderkey")
      rebuilt.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .as("sum_cents"),
          min(col("o_orderkey")).as("min_k"), max(col("o_orderkey")).as("max_k"))
        .orderBy(col("o_orderstatus"))
    }

    def oldQ93(s: SparkSession, d: String): DataFrame = {
      val docs = Tables.spread(Tables.documents(s, d))
        .withColumn("th", TextDedup.tokenHashes(col("text")))
      val stream = docs.select(col("doc_id"), col("lang"), explode(col("th")).as("t"))
      val dim = stream.groupBy(col("t")).agg(
        count(lit(1)).as("cb"),
        count(when(col("lang") === "en", 1)).as("ct"))
      val tot = dim.agg(sum(col("ct")).as("nt"), sum(col("cb")).as("nb"),
        count(lit(1)).as("v"))
      stream.join(dim, "t")
        .crossJoin(broadcast(tot))
        .withColumn("llr_1e6",
          floor(log((col("ct").cast("double") + 1.0) /
            (col("nt").cast("double") + col("v").cast("double"))) * 1e6 + 0.5).cast("long") -
          floor(log((col("cb").cast("double") + 1.0) /
            (col("nb").cast("double") + col("v").cast("double"))) * 1e6 + 0.5).cast("long"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_toks"), sum(col("llr_1e6")).as("llr_sum_1e6"))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          ratio1e4(col("llr_sum_1e6").cast("double") /
            (col("n_toks").cast("double") * 1e6)).as("mean_llr_1e4"))
        .orderBy(col("doc_id"))
    }

    def oldQ72(s: SparkSession, d: String): DataFrame = {
      val th = TextDedup.tokenHashes(col("text"))
      val docs = Tables.spread(Tables.documents(s, d)).withColumn("th", th)
      val uniStream = docs.select(col("doc_id"), explode(col("th")).as("t1"))
      val bigStream = docs.select(col("doc_id"), explode(
          when(size(col("th")) >= 2,
            transform(sequence(lit(0), size(col("th")) - 2),
              i => struct(get(col("th"), i).as("t1"),
                ((get(col("th"), i) * 8191L + get(col("th"), i + 1)) % P).as("h"))))
            .otherwise(array().cast("array<struct<t1:bigint,h:bigint>>"))).as("bg"))
        .select(col("doc_id"), col("bg.t1").as("t1"), col("bg.h").as("h"))
      val uni = uniStream.groupBy(col("t1")).agg(count(lit(1)).as("c1"))
      val big = bigStream.groupBy(col("h")).agg(count(lit(1)).as("c2"))
      val vocab = uniStream.select(countDistinct(col("t1")).as("v"))
      bigStream
        .join(big, "h")
        .join(uni, "t1")
        .crossJoin(broadcast(vocab))
        .withColumn("lp_1e6",
          floor(log((col("c2").cast("double") + 1.0) /
            (col("c1").cast("double") + col("v").cast("double"))) * 1e6 + 0.5)
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_1e6")).as("lp_sum_1e6"))
        .select(col("doc_id"), col("n_bigrams"),
          ratio1e4(col("lp_sum_1e6").cast("double") /
            (col("n_bigrams").cast("double") * 1e6)).as("mean_lp_1e4"))
        .orderBy(col("doc_id"))
    }

    def oldQ63(s: SparkSession, d: String): DataFrame = {
      val docs = Tables.spread(Tables.documents(s, d))
      val dfDim = docs
        .select(explode(array_distinct(toks(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs.filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf_1e4").desc, col("token"))
      tf
        .join(broadcast(dfDim), "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf_1e4", ratio1e4(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("df"),
          col("tfidf_1e4"))
        .orderBy(col("doc_id"), col("rn"))
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
      println(f"[pass] $name%-12s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    val pairs: Seq[(String, () => DataFrame, String, () => DataFrame)] = Seq(
      ("q149_old", () => oldQ149(spark, sfDir),
        "q149_new", () => graft.SparkEntry.queries("q149_diff_apply")(spark, sfDir)),
      ("q93_old", () => oldQ93(spark, sfDir),
        "q93_new", () => graft.SparkEntry.queries("q93_dsir_weights")(spark, sfDir)),
      ("q72_old", () => oldQ72(spark, sfDir),
        "q72_new", () => graft.SparkEntry.queries("q72_ngram_lm_score")(spark, sfDir)),
      ("q63_old", () => oldQ63(spark, sfDir),
        "q63_new", () => graft.SparkEntry.queries("q63_text_tfidf")(spark, sfDir)))

    pairs.foreach { case (an, a, bn, b) =>
      time(a()); time(b())
      val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
      (1 to reps).foreach { _ => as += time(a()); bs += time(b()) }
      report(an, as.result()); report(bn, bs.result())
    }
    spark.stop()
  }
}
