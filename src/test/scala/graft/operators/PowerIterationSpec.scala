package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PowerIterationSpec extends SparkTestBase {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("gram matrix matches the hand-computed quantized outer-product sum") {
    // two 2-d vectors; quantization: (1,0)->(127,0), (1,1)->(127,127)
    val g = PowerIteration.gram(
        emb((1L, Seq(1f, 0f)), (2L, Seq(0.5f, 0.5f))), "embedding")
      .orderBy($"i", $"j").as[(Int, Int, Long)].collect().toSeq
    val c = 127L * 127L
    assert(g === Seq((0, 0, 2 * c), (0, 1, c), (1, 0, c), (1, 1, c)))
  }

  test("power iteration finds the dominant axis of an axis-aligned cloud") {
    // mass concentrated on dim 0: the dominant direction must peak
    // there (|v_0| = 1e6 after rescale) and stay near zero on dim 2
    val rows = (1L to 20L).map(i => (i, Seq(1f, 0.1f, 0f))) ++
      Seq((21L, Seq(0f, 0.2f, 0.1f)))
    val v = PowerIteration.dominantDirection(emb(rows: _*), "embedding", 8)
      .orderBy($"i").as[(Long, Long)].collect().toSeq
    assert(v.size === 3)
    assert(v(0)._2 === 1000000L, s"dim 0 must dominate: $v")
    assert(math.abs(v(2)._2) < 200000L, s"dim 2 must stay minor: $v")
  }

  test("a NaN component drops the WHOLE vector (column-form parity)") {
    // the quantized() column algebra: array_max treats NaN as greatest,
    // so one NaN poisons every division and the vector contributes
    // nothing — the fused JVM quantization must match (review fix: a
    // plain `a > amax` comparison would silently skip the NaN and let
    // the finite components contribute)
    val g = PowerIteration.gram(
        emb((1L, Seq(1f, 0f)), (2L, Seq(Float.NaN, 1f))), "embedding")
      .orderBy($"i", $"j").as[(Int, Int, Long)].collect().toSeq
    assert(g === Seq((0, 0, 127L * 127L), (0, 1, 0L), (1, 0, 0L), (1, 1, 0L)))
  }

  test("zero vectors are dropped, all-zero input is refused") {
    val g = PowerIteration.gram(
        emb((1L, Seq(1f, 0f)), (2L, Seq(0f, 0f))), "embedding")
      .orderBy($"i", $"j").as[(Int, Int, Long)].collect().toSeq
    // only vector 1 contributes: its outer product alone
    assert(g === Seq((0, 0, 127L * 127L), (0, 1, 0L), (1, 0, 0L), (1, 1, 0L)))
    intercept[IllegalArgumentException] {
      PowerIteration.dominantDirection(
        emb((1L, Seq(0f, 0f))), "embedding", 4)
    }
  }
}
