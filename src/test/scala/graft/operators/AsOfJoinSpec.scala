package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** AsOfJoin must agree with the brute-force correlated formulation
  * (max right.time <= left.time per key) on random data, including
  * equal-timestamp and no-prior-row edges. */
class AsOfJoinSpec extends SparkTestBase {

  test("lastPrior equals brute-force point-in-time lookup") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "left_id")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, s"v$i"))
      .toDF("k", "t", "payload")

    val got = AsOfJoin.lastPrior(left, right, "k", "t", "t", Seq("t", "payload"))
      .select(col("left_id"), col("asOf.t").as("rt"), col("asOf.payload").as("p"))

    // brute force: join all priors, keep the latest (tie-break payload desc
    // mirrors the window's last-wins order only when timestamps are unique;
    // make timestamps unique per key on the right to avoid ambiguity)
    val rightU = right.groupBy("k", "t").agg(max("payload").as("payload"))
    val gotU = AsOfJoin.lastPrior(left, rightU, "k", "t", "t", Seq("t", "payload"))
      .select(col("left_id"), col("asOf.t").as("rt"), col("asOf.payload").as("p"))
    val brute = left.as("l").join(rightU.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("left_id")).orderBy(col("r.t").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("r.t").as("rt"), col("r.payload").as("p"))

    assert(gotU.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(gotU).count() === 0L)
    assert(got.count() === 300L) // every left row survives (left semantics)
  }

  test("equal timestamps are visible; missing priors yield null") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "L1"), (1L, 50L, "L0")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, "same-ts"), (2L, 10L, "other-key")).toDF("k", "t", "v")
    val out = AsOfJoin.lastPrior(left, right, "k", "t", "t", Seq("v"))
      .select(col("tag"), col("asOf.v")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("L1") === Some("same-ts")) // right at equal ts counts (<=)
    assert(out("L0") === None)            // no prior right row
  }
}
