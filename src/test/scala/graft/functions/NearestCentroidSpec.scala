package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The per-row argmax kernel must equal the r14 crossJoin + max(struct)
  * expansion on every input — cosine algebra (same folds, same operand
  * order), tie-break (highest cos then smallest cid), NaN (zero-norm
  * vectors), ±0.0 cosines (orthogonal vectors), float and double
  * element types. That identity is what lets assignToCentroids and
  * q157 drop the n×C expansion without touching a declared result. */
class NearestCentroidSpec extends SparkTestBase {
  import spark.implicits._

  private def crossJoinBest(base: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame) = {
    val cosine = graft.functions.VectorOps.vectorDot(col("v"), col("cv")) /
      (graft.functions.VectorOps.vectorNorm(col("v")) *
        graft.functions.VectorOps.vectorNorm(col("cv")))
    base.crossJoin(broadcast(cents))
      .select(col("id"), col("cid"), cosine.as("cs"))
      .groupBy(col("id"))
      .agg(max(struct(col("cs"), (-col("cid")).as("nc"))).as("m"))
      .select(col("id"), (-col("m.nc")).as("cid"), col("m.cs").as("cos"))
  }

  private def kernelBest(base: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame) = {
    val bc = NearestCentroid.broadcastCentroids(cents)
    base.select(col("id"),
        NearestCentroid.nearestCentroid(col("v"), bc).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.cos").as("cos"))
  }

  private def check(rows: Seq[(Long, Seq[Double])], cents: Seq[(Long, Seq[Double])]): Unit = {
    val base = rows.toDF("id", "v")
    val cf = cents.toDF("cid", "cv")
    val want = crossJoinBest(base, cf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).sortBy(_._1)
    val got = kernelBest(base, cf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).sortBy(_._1)
    // NaN cos: the expansion's max(struct) keeps NaN (greatest); compare
    // raw bits so NaN == NaN and -0.0 != 0.0 surfaces any divergence
    assert(got.toSeq === want.toSeq)
  }

  test("kernel equals the crossJoin expansion on random doubles") {
    val rnd = new scala.util.Random(11)
    def vec(d: Int) = Seq.fill(d)(rnd.nextDouble() * 2 - 1)
    check((1L to 60L).map(i => (i, vec(8))), (1L to 13L).map(i => (i * 3, vec(8))))
  }

  test("ties break to the smallest cid (duplicate centroids)") {
    val v = Seq(0.5, 0.5, 0.1)
    check(
      (1L to 5L).map(i => (i, Seq(i.toDouble, 1.0, 0.0))),
      Seq((9L, v), (3L, v), (7L, v))) // identical vectors, distinct cids
  }

  test("orthogonal vectors (+-0.0 cosines) match the expansion") {
    // cos = +0.0 vs -0.0 across centroids: Spark's double ordering
    // treats them equal, so the tie must break to the smaller cid in
    // both forms
    check(
      Seq((1L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0))),
      Seq((4L, Seq(0.0, 1.0)), (5L, Seq(0.0, -1.0))))
  }

  test("zero-norm input (outside every caller's domain) is total: NaN, min cid") {
    // The expansion is PARTIAL here — ANSI errors on the zero divisor
    // (non-ANSI yields NULL): q108 filters zero-norm embeddings and the
    // vector fixtures are non-zero, so no declared query reaches this.
    // The kernel stays total: NaN cosine, ranked greatest, ties to the
    // smallest cid.
    val bc = NearestCentroid.broadcastCentroids(
      Seq((9L, Seq(0.0, 1.0)), (3L, Seq(1.0, 0.0))).toDF("cid", "cv"))
    val got = Seq((1L, Seq(0.0, 0.0))).toDF("id", "v")
      .select(NearestCentroid.nearestCentroid(col("v"), bc).as("m"))
      .select(col("m.cid"), col("m.cos")).collect().head
    assert(got.getLong(0) === 3L && got.getDouble(1).isNaN)
  }

  test("float input vectors widen exactly like the expansion") {
    val rnd = new scala.util.Random(5)
    val base = (1L to 40L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    val cents = (1L to 7L).map(i =>
      (i * 2, Seq.fill(6)(rnd.nextFloat() * 2 - 1))).toDF("cid", "cv")
    val want = crossJoinBest(base, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).sortBy(_._1)
    val got = kernelBest(base, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("empty centroid frame refuses loudly") {
    val cents = Seq.empty[(Long, Seq[Double])].toDF("cid", "cv")
    intercept[IllegalArgumentException] {
      NearestCentroid.broadcastCentroids(cents)
    }
  }
}
