package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextDedup

/** Recall probe for the MinHash-LSH banding — the text-side analog of
  * AnnRecall (r9): the q33 family's oracle hash-checks VALUES for the
  * fixed 4×2 banding, but only a probe can say what fraction of the
  * TRUE near-dup pairs the band candidates reach, and what each
  * alternative banding of the same 8 permutations would trade.
  *
  * Ground truth = the exact shared-shingle Jaccard pairs (q32's
  * algebra, no LSH) at each threshold. Candidates = band-equality
  * pairs under (bands × rows) ∈ {8×1, 4×2, 2×4} — same signatures,
  * different row grouping, so the sweep isolates the banding choice.
  * Prints one JSON line per (banding, threshold) with recall and the
  * candidate-pair count (the cost recall is bought with — more bands /
  * fewer rows ⇒ more candidates ⇒ higher recall, the standard S-curve
  * trade).
  *
  * Usage: runMain graft.tools.TextLshRecall [sfDir] [maxDocId]
  */
object TextLshRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxId = args.lift(1).map(_.toLong).getOrElse(2000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-text-lsh-recall")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.spread(Tables.documents(spark, sfDir)
      .filter(col("doc_id") < maxId))
    val sh = TextDedup.shingleHashes(docs)
      .repartition(spark.sparkContext.defaultParallelism, col("h"))
      .localCheckpoint(eager = true)

    // exact ground truth: all pairs sharing >= 1 shingle, with exact J
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.join(broadcast(sizes), "doc_id")
      .select(col("doc_id").as("d1"), col("h"), col("n").as("n1"))
    val b = sh.join(broadcast(sizes), "doc_id")
      .select(col("doc_id").as("d2"), col("h").as("h2"), col("n").as("n2"))
    val exact = a.join(b, col("h") === col("h2") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"), first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double")).as("j"))
      .localCheckpoint(eager = true)

    // per-doc minima of the 8 shared permutations
    val mhAggs = TextDedup.HashParams.map { case (k, aa, bb) =>
      min((lit(aa) * col("h") + lit(bb)) % TextDedup.P).as(s"mh$k")
    }
    val mh = sh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
      .localCheckpoint(eager = true)

    def candidates(rowsPerBand: Int): DataFrame = {
      val nBands = 8 / rowsPerBand
      val bandCol = array((0 until nBands).map(bd => struct(lit(bd).as("band"),
        concat_ws("-", (0 until rowsPerBand).map(r =>
          col(s"mh${rowsPerBand * bd + r}")): _*).as("sig"))): _*)
      val bands = mh.select(col("doc_id"), explode(bandCol).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      val ba = bands.select(col("doc_id").as("d1"), col("band"), col("sig"))
      val bb2 = bands.select(col("doc_id").as("d2"),
        col("band").as("band2"), col("sig").as("sig2"))
      ba.join(bb2, col("band") === col("band2") && col("sig") === col("sig2") &&
          col("d1") < col("d2"))
        .select(col("d1"), col("d2")).distinct()
    }

    for (rowsPerBand <- Seq(1, 2, 4)) {
      val cand = candidates(rowsPerBand).localCheckpoint(eager = true)
      val nCand = cand.count()
      for (thr <- Seq(0.3, 0.5, 0.8)) {
        val truth = exact.filter(col("j") >= thr)
        val nTrue = truth.count()
        val hit = truth.join(cand, Seq("d1", "d2"), "leftsemi").count()
        val recall = if (nTrue == 0) 1.0 else hit.toDouble / nTrue
        println(s"""{"banding":"${8 / rowsPerBand}x$rowsPerBand","threshold":$thr,""" +
          f""""n_true":$nTrue,"n_candidates":$nCand,"recall":$recall%.4f}""")
      }
    }
    spark.stop()
  }
}
