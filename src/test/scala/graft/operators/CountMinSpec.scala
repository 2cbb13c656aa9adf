package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private def freqs = Seq.tabulate(200)(i => (i.toLong % 23, 1L))
    .toDF("k", "one")

  test("estimates never undercount (one-sided guarantee)") {
    val df = freqs
    val sketch = CountMin.build(df, col("k"), lit(1L), width = 64)
    val exact = df.groupBy($"k").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(sketch, exact, "k", width = 64)
    val bad = est.filter($"cm_est" < $"exact").count()
    assert(bad === 0L)
    // total mass conservation per sketch row: every row of the grid
    // holds the full input weight
    val rowMass = sketch.groupBy($"r").agg(sum($"cnt").as("m"))
      .select($"m").as[Long].collect().toSet
    assert(rowMass === Set(200L))
  }

  test("merge of shard sketches equals the full-corpus sketch") {
    val df = freqs
    val (a, b) = (df.filter($"k" < 12), df.filter($"k" >= 12))
    val full = CountMin.build(df, col("k"), lit(1L), width = 64)
      .orderBy($"r", $"c").as[(Int, Int, Long)].collect().toSeq
    val merged = CountMin.merge(
        CountMin.build(a, col("k"), lit(1L), width = 64),
        CountMin.build(b, col("k"), lit(1L), width = 64))
      .orderBy($"r", $"c").as[(Int, Int, Long)].collect().toSeq
    assert(merged === full)
  }

  test("weighted build sums weights, and an empty sketch estimates 0") {
    val df = Seq((1L, 5L), (1L, 7L), (2L, 3L)).toDF("k", "w")
    val sketch = CountMin.build(df, col("k"), col("w"), width = 64)
    val est = CountMin.estimate(sketch, Seq(1L, 2L).toDF("k"), "k", width = 64)
      .orderBy($"k").as[(Long, Long)].collect().toSeq
    assert(est.head._2 >= 12L && est(1)._2 >= 3L)
    // empty build side -> empty grid; the probe's left join + coalesce
    // floors every estimate at 0 instead of dropping the key
    val empty = CountMin.build(df.filter(lit(false)), col("k"), col("w"), width = 64)
    val zero = CountMin.estimate(empty, Seq(9L).toDF("k"), "k", width = 64)
      .select($"cm_est").as[Long].collect().toSeq
    assert(zero === Seq(0L))
  }

  test("negative keys pmod-fold instead of producing negative cells") {
    val df = Seq(-5L, -1L, 3L).toDF("k")
    val sketch = CountMin.build(df, col("k"), lit(1L), width = 64)
    val cells = sketch.select($"c").as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 64))
    val est = CountMin.estimate(sketch, Seq(-5L).toDF("k"), "k", width = 64)
      .select($"cm_est").as[Long].collect().head
    assert(est >= 1L)
  }

  test("linearity: build over per-key counts equals build over raw rows") {
    // the q112/q127 r14 shared-pass rewrite relies on this cell-for-cell
    val df = freqs
    val raw = CountMin.build(df, col("k"), lit(1L), width = 64)
      .orderBy($"r", $"c").as[(Int, Int, Long)].collect().toSeq
    val perKey = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
    val pre = CountMin.build(perKey, col("k"), col("cnt"), width = 64)
      .orderBy($"r", $"c").as[(Int, Int, Long)].collect().toSeq
    assert(pre === raw)
  }
}
