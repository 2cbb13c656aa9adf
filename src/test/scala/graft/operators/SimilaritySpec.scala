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
