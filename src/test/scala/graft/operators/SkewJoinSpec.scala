package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Salted join must be result-equivalent to the plain join — salting
  * only changes the physical distribution, never the answer. */
class SkewJoinSpec extends SparkTestBase {

  test("salted inner join equals plain inner join on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of left rows hit one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong)).toDF("k", "row_id")
    val right = (0L to 49L).map(k => (k, s"dim-$k")).toDF("rk", "attr")

    val plain = left.join(right, col("k") === col("rk"))
      .select(col("row_id"), col("attr"))
    val salted = SkewJoin.saltedInner(left, "k", col("row_id"), right, "rk", 8)
      .select(col("row_id"), col("attr"))

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  test("salt spreads the hot key across buckets") {
    val s = spark
    import s.implicits._
    val left = (1 to 1000).map(i => (7L, i.toLong)).toDF("k", "row_id")
    val buckets = left
      .withColumn("salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("salt").count().collect().map(_.getLong(1))
    assert(buckets.length === 8, "all 8 salt buckets populated")
    assert(buckets.max < 1000 * 0.25, s"hot key still concentrated: ${buckets.toSeq}")
  }
}
