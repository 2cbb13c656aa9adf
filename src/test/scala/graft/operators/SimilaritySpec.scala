package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  private def vecDf(vs: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    vs.toSeq.toDF("vec_id", "v")
  }

  test("hyperplaneBucket is deterministic and equals a driver-side replica") {
    val v = (0 until 64).map(t => (math.sin(t + 1) * 10).toFloat)
    val df = vecDf((1L, v))
      .select(Similarity.hyperplaneBucket(col("v"), 6, 64, 0).as("b"))
    val got = df.collect().head.getLong(0)
    // driver-side replica of the same fold
    var want = 0L
    for (i <- 0 until 6) {
      var dot = 0.0
      for (t <- 0 until 64) dot += v(t).toDouble * ((((i * 131) + t * 137) % 19) - 9).toDouble
      if (dot >= 0.0) want |= (1L << i)
    }
    assert(got == want)
    assert(got >= 0 && got < 64)
  }

  test("identical vectors share every bucket; seedOffset changes the table") {
    val v = (0 until 64).map(t => (t % 7 - 3).toFloat)
    val df = vecDf((1L, v), (2L, v))
      .select(col("vec_id"),
        Similarity.hyperplaneBucket(col("v"), 6, 64, 0).as("b0"),
        Similarity.hyperplaneBucket(col("v"), 6, 64, 6).as("b1"))
    val rows = df.collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows(0) == rows(1), "same vector, same buckets")
  }

  test("lshTopKMultiProbe: candidate set ⊇ single-bucket, masks correct (r12)") {
    // probeMasks law: C(n,0..h) masks, pairwise distinct, popcount ≤ h
    val m1 = Similarity.probeMasks(6, 1)
    assert(m1.size == 7 && m1.distinct.size == 7)
    assert(m1.forall(m => java.lang.Long.bitCount(m) <= 1))
    val m2 = Similarity.probeMasks(8, 2)
    assert(m2.size == 1 + 8 + 28)
    // a corpus spread over buckets: multiprobe at k=corpus-size returns
    // a SUPERSET of the single-bucket batch result for every probe
    val base = vecDf((1 to 40).map(i =>
      (i.toLong, (0 until 64).map(t => (math.sin(i * 3 + t) * 5).toFloat))): _*)
    val probes = base.filter(col("vec_id") <= 3)
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select(col("pid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = got(Similarity.lshTopKBatch(
      base, "vec_id", "v", probes, "pid", "pv", 40, 6, 64))
    val multi = got(Similarity.lshTopKMultiProbe(
      base, "vec_id", "v", probes, "pid", "pv", 40, 6, 64))
    assert(single.subsetOf(multi),
      s"single-bucket candidates must survive multiprobe: ${single -- multi}")
    // h=2 widens further
    val multi2 = got(Similarity.lshTopKMultiProbe(
      base, "vec_id", "v", probes, "pid", "pv", 40, 6, 64, hamming = 2))
    assert(multi.subsetOf(multi2))
  }

  test("nearDupPairs refuses inputs above the all-pairs bound") {
    val df = vecDf((1 to 20).map(i =>
      (i.toLong, (0 until 8).map(t => (i + t).toFloat))): _*)
    // construction is LAZY (no eager pre-scan, ADVICE r5); the in-plan
    // guard fails the JOB when it runs
    val over = Similarity.nearDupPairs(df, "vec_id", "v", lit(0.0), maxRows = 10L)
    val e = intercept[Exception](over.count())
    assert(e.getMessage.contains("O(n^2)"), e.getMessage)
    // within the bound the same call succeeds
    assert(Similarity.nearDupPairs(df, "vec_id", "v", lit(0.99), maxRows = 20L)
      .count() > 0)
  }

  test("semanticDedup refuses a pathologically hot cluster (skew guard)") {
    val rnd = new scala.util.Random(3)
    // 30 vectors all pointing the same way -> every one lands in cluster 10
    val df = vecDf((1 to 30).map(i =>
      (i.toLong, Seq(1f, rnd.nextFloat() * 0.01f, 0f, 0f))): _*)
    val s = spark
    import s.implicits._
    val cent = Seq((10L, Seq(1f, 0f, 0f, 0f)), (20L, Seq(0f, 1f, 0f, 0f)))
      .toDF("cid", "cv")
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(df, "vec_id", "v", cent, lit(0.999),
        maxClusterRows = 10L)
    }
    assert(e.getMessage.contains("cluster 10"), e.getMessage)
    assert(e.getMessage.contains("30 vectors"), e.getMessage)
    // an adequate clustering granularity (bound >= occupancy) passes
    assert(Similarity.semanticDedup(df, "vec_id", "v", cent, lit(0.999),
      maxClusterRows = 30L).count() == 30L)
  }

  test("nearDupPairsBucketed emits a subset of brute force with identical scores") {
    val rnd = new scala.util.Random(7)
    val df = vecDf((1 to 40).map(i =>
      (i.toLong, (0 until 16).map(_ => rnd.nextFloat() * 2 - 1))): _*)
    val brute = Similarity.nearDupPairs(df, "vec_id", "v", lit(0.2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = Similarity.nearDupPairsBucketed(df, "vec_id", "v", lit(0.2),
        nBits = 2, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(bucketed.nonEmpty, "2-bit buckets must collide on 40 vectors")
    bucketed.foreach { case (pair, score) =>
      assert(brute.contains(pair), s"$pair not in brute-force result")
      assert(brute(pair) == score, s"$pair: score drift")
    }
    // the bucket join never materializes a cross product
    val plan = Similarity.nearDupPairsBucketed(df, "vec_id", "v", lit(0.2),
      nBits = 2, dim = 16).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("semanticDedup keeps the minimal id of each within-cluster dup pair") {
    // two well-separated clusters; vectors 1/2 and 4/5 are near-twins
    val df = vecDf(
      (1L, Seq(1f, 0.010f, 0f, 0f)), // cluster A
      (2L, Seq(1f, 0.011f, 0f, 0f)), // near-twin of 1 → dropped
      (3L, Seq(0.9f, 0.4f, 0f, 0f)), // cluster A, but below the cut → kept
      (4L, Seq(0.010f, 1f, 0f, 0f)), // cluster B
      (5L, Seq(0.012f, 1f, 0f, 0f))) // near-twin of 4 → dropped
    val s = spark
    import s.implicits._
    val cent = Seq((10L, Seq(1f, 0f, 0f, 0f)), (20L, Seq(0f, 1f, 0f, 0f)))
      .toDF("cid", "cv")
    val out = Similarity.semanticDedup(df, "vec_id", "v", cent, lit(0.999))
    val rows = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == Map(
      1L -> (10L, 1L), 2L -> (10L, 0L), 3L -> (10L, 1L),
      4L -> (20L, 1L), 5L -> (20L, 0L)))
    // candidates come from cluster-id equality, never a corpus cross
    // product (the centroid expansion is the only broadcast loop)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kmeansTrain equals manually unrolled kmeansStep rounds") {
    val rnd = new scala.util.Random(11)
    val df = vecDf((1 to 60).map(i =>
      (i.toLong, (0 until 8).map(_ => rnd.nextFloat() * 2 - 1))): _*)
    val cent0 = df.filter(col("vec_id") <= 3)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    def unrollOnce(c: org.apache.spark.sql.DataFrame) = {
      val upd = Similarity.kmeansStep(df, "vec_id", "v", c)
        .withColumn("x", col("sx_1e6").cast("double") / (col("n").cast("double") * 1e6))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
        .select(col("cid"), transform(col("px"), s => s.getField("x")).as("ncv"))
      c.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ncv"), col("cv")).as("cv"))
    }
    val manual = Similarity.kmeansStep(df, "vec_id", "v",
        unrollOnce(unrollOnce(cent0)))
      .orderBy("cid", "pos").collect().toSeq
    val trained = Similarity.kmeansStep(df, "vec_id", "v",
        Similarity.kmeansTrain(df, "vec_id", "v", cent0, iters = 2))
      .orderBy("cid", "pos").collect().toSeq
    assert(trained == manual)
    assert(trained.nonEmpty)
  }

  test("cosineTopK ranks an exact duplicate first") {
    val q = (0 until 64).map(t => (t + 1).toFloat)
    val near = q.map(x => x * 2.0f) // cosine 1.0 (colinear)
    val far = (0 until 64).map(t => if (t % 2 == 0) 1.0f else -1.0f)
    val base = vecDf((10L, near), (20L, far))
    val qv = vecDf((1L, q)).select(col("v").as("qv"))
    val got = Similarity.cosineTopK(base, "vec_id", "v", qv, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 10L)
  }
}
