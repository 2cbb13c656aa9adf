package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Recall probe for the approximate-nearest-neighbor paths — the
  * quality evidence the DuckDB oracle can't give them (q36/q59/q73
  * hash-check VALUES for fixed parameters; this measures how much of
  * the true top-k the approximations keep as their knobs move).
  *
  * Ground truth = exact brute-force cosine top-k per probe (the q30
  * path). Probes = a deterministic sample of the corpus itself
  * (vec_id % step == 0), self-match excluded.
  *
  * Prints one JSON line per (method, param): mean recall@k over the
  * probes plus candidate-set statistics (scanned fraction — the cost
  * the approximation buys its recall with).
  *
  * Usage: runMain graft.tools.AnnRecall [sfDir] [k] [probeStep]
  */
object AnnRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val probeStep = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    val probes = base.filter(col("vec_id") % probeStep === 0)
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))

    // ground truth via the batch-probe shape with an all-in-one bucket
    // (bucket-join with 0 bits would collide everything; use the exact
    // crossJoin form): per probe, top-k by cosine, self excluded
    val truth = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("pv")).as("score"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("pid"), col("vec_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val nProbes = truth.size

    def report(method: String, param: String, got: DataFrame,
        scannedFrac: Double): Unit = {
      val byProbe = got.select(col("pid"), col("vec_id"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
      val recall = truth.map { case (p, t) =>
        byProbe.get(p).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
      }.sum / nProbes
      println(f"""{"method":"$method","param":"$param","k":$k,""" +
        f""""n_probes":$nProbes,"recall":$recall%.4f,"scanned_frac":$scannedFrac%.4f}""")
    }

    // LSH hyperplane buckets: recall vs bits (bucket count 2^bits;
    // expected scanned fraction ~= 1 / 2^bits of the corpus per probe)
    for (bits <- Seq(2, 4, 6)) {
      val got = Similarity.lshTopKBatch(base, "vec_id", "embedding",
          probes, "pid", "pv", k, bits, 64)
        .filter(col("vec_id") =!= col("pid"))
      report("lsh_hyperplane", s"bits=$bits", got, 1.0 / (1L << bits))
    }

    // MULTI-PROBE LSH (r12, verdict item 5): all buckets within
    // Hamming distance h — scanned fraction ~= |masks| / 2^bits
    for ((bits, h) <- Seq((4, 1), (5, 1), (6, 1), (8, 1), (8, 2), (10, 2))) {
      val got = Similarity.lshTopKMultiProbe(base, "vec_id", "embedding",
          probes, "pid", "pv", k, bits, 64, hamming = h)
        .filter(col("vec_id") =!= col("pid"))
      report("lsh_multiprobe", s"bits=$bits,h=$h", got,
        Similarity.probeMasks(bits, h).size.toDouble / (1L << bits))
    }

    // TWO-TABLE multi-probe (the union recall lever): Hamming-1 rings
    // in two independent hyperplane tables, candidates unioned before
    // the rerank — scan ~2×(bits+1)/2^bits, recall ~1-(1-r)^2
    for (bits <- Seq(6, 8)) {
      val g0 = Similarity.lshTopKMultiProbe(base, "vec_id", "embedding",
        probes, "pid", "pv", k, bits, 64, seedOffset = 0)
      val g1 = Similarity.lshTopKMultiProbe(base, "vec_id", "embedding",
        probes, "pid", "pv", k, bits, 64, seedOffset = bits)
      val got = g0.unionByName(g1)
        .select(col("pid"), col("vec_id"), col("score")).distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
            .orderBy(col("score").desc, col("vec_id"))))
        .filter(col("rn") <= k)
        .filter(col("vec_id") =!= col("pid"))
      report("lsh_multiprobe_2t", s"bits=$bits,h=1", got,
        2.0 * (bits + 1).toDouble / (1L << bits))
    }

    // IVF: recall vs nprobe (scanned fraction ~= nprobe / nCentroids).
    // ivfTopK takes ONE query vector; run it per probe via the batch
    // bucket path instead: assign base once, then per-probe top-k
    // among the nprobe nearest centroids' members.
    def ivfSweep(method: String, cent: DataFrame,
        nprobes: Seq[Int] = Seq(1, 4, 8), multiAssign: Int = 1): Unit = {
      val nCent = cent.count().toDouble
      for (nprobe <- nprobes) {
        val asg = base.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("embedding"),
            col("cid"), Similarity.cosine(col("embedding"), col("cv")).as("ccos"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
              .orderBy(col("ccos").desc, col("cid"))))
          .filter(col("rn") <= multiAssign)
          .select(col("vec_id"), col("embedding"), col("cid").as("acid"))
        val probeCents = probes.crossJoin(broadcast(cent))
          .select(col("pid"), col("pv"), col("cid"),
            Similarity.cosine(col("pv"), col("cv")).as("pcos"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
              .orderBy(col("pcos").desc, col("cid"))))
          .filter(col("rn") <= nprobe)
          .select(col("pid"), col("pv"), col("cid").as("pcid"))
        val got = asg.join(probeCents, col("acid") === col("pcid"))
          .filter(col("vec_id") =!= col("pid"))
          .select(col("pid"), col("pv"), col("vec_id"), col("embedding"))
          .distinct() // multi-assign can surface a candidate twice
          .select(col("pid"), col("vec_id"),
            Similarity.cosine(col("embedding"), col("pv")).as("score"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
              .orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= k)
        val ma = if (multiAssign > 1) s",ma=$multiAssign" else ""
        report(method, s"nprobe=$nprobe$ma", got,
          multiAssign * nprobe / nCent)
      }
    }

    // r14 (verdict item 4): "committed" mode re-measures ONLY the q156
    // operating-point family at another corpus scale — the %17-seeded
    // one-Lloyd-round index — with a caller-chosen nprobe list (the
    // scan fraction is nprobe/nCent, and nCent grows with the corpus
    // under a modulo seed, so the 10× frontier needs its own sweep).
    //   runMain graft.tools.AnnRecall /tmp/sf1 5 50 committed 60,120,180,250
    val mode = args.lift(3).getOrElse("full")
    if (mode == "committed") {
      val nprobes = args.lift(4)
        .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(20, 25))
      val cent17 = base.filter(col("vec_id") % 17 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      ivfSweep("ivf_trained_f17_i1",
        Similarity.kmeansTrain(base, "vec_id", "embedding", cent17, iters = 1),
        nprobes)
      println(s"""{"method":"brute_force","param":"exact","k":$k,""" +
        s""""n_probes":$nProbes,"recall":1.0,"scanned_frac":1.0,"n_base":$nBase}""")
      spark.stop()
      return
    }

    // fixed seed centroids: vec_id%101 sample (~1% of corpus)
    val cent = base.filter(col("vec_id") % 101 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    ivfSweep("ivf", cent)
    // TRAINED centroids (r8 verdict item 8): the same seeds refined by
    // the library's Lloyd loop (kmeansTrain, q78's operator) — the
    // "trained offline" assumption the IVF index documents, now actually
    // wired in. Same nprobe sweep ⇒ same scanned fraction, so any
    // recall gain is pure index quality.
    ivfSweep("ivf_trained",
      Similarity.kmeansTrain(base, "vec_id", "embedding", cent, iters = 3))

    // FINER trained index (r12): ~2× the centroids — granularity is the
    // recall-per-scan dial (same scan fraction splits into smaller,
    // better-targeted cells)
    val centFine = base.filter(col("vec_id") % 47 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    ivfSweep("ivf_trained_fine",
      Similarity.kmeansTrain(base, "vec_id", "embedding", centFine, iters = 3),
      Seq(4, 6, 8))
    // the EXACT q154 configuration (iters=1 keeps the oracle one
    // unrolled Lloyd round, the q106 shape) — this row is the committed
    // quality claim behind the oracled query
    ivfSweep("ivf_trained_fine_i1",
      Similarity.kmeansTrain(base, "vec_id", "embedding", centFine, iters = 1),
      Seq(8))

    // r13 (verdict item 3): the ≥0.70-recall hunt at ≤25% scan —
    // (a) the fine index pushed to the scan budget's edge,
    // (b) EVEN finer trained indexes (granularity is the
    //     recall-per-scan dial; scan = nprobe/nCent stays bounded),
    // (c) top-2 multi-assignment (boundary vectors live in BOTH their
    //     closest cells; scan cost = 2×nprobe/nCent).
    ivfSweep("ivf_trained_fine",
      Similarity.kmeansTrain(base, "vec_id", "embedding", centFine, iters = 3),
      Seq(9, 10, 11))
    ivfSweep("ivf_trained_fine_ma2",
      Similarity.kmeansTrain(base, "vec_id", "embedding", centFine, iters = 3),
      Seq(4, 5), multiAssign = 2)
    val cent29 = base.filter(col("vec_id") % 29 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val t29 = Similarity.kmeansTrain(base, "vec_id", "embedding", cent29,
      iters = 3)
    ivfSweep("ivf_trained_f29", t29, Seq(12, 15, 17))
    ivfSweep("ivf_trained_f29_ma2", t29, Seq(6, 8), multiAssign = 2)
    val cent17 = base.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val t17 = Similarity.kmeansTrain(base, "vec_id", "embedding", cent17,
      iters = 3)
    ivfSweep("ivf_trained_f17", t17, Seq(20, 25, 29))
    ivfSweep("ivf_trained_f17_ma2", t17, Seq(10, 14), multiAssign = 2)
    // the q156 oracle keeps ONE unrolled Lloyd round (the q154/q106
    // convention) — this row is the committed quality claim for it
    ivfSweep("ivf_trained_f17_i1",
      Similarity.kmeansTrain(base, "vec_id", "embedding", cent17, iters = 1),
      Seq(20, 25))

    println(s"""{"method":"brute_force","param":"exact","k":$k,""" +
      s""""n_probes":$nProbes,"recall":1.0,"scanned_frac":1.0,"n_base":$nBase}""")
    spark.stop()
  }
}
