package graft.functions

import graft.{SparkTestBase, Tables}
import graft.cdc.Sharding
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {

  test("Fnv1aHash expression matches the scalar FNV-1a (codegen path)") {
    val s = spark
    import s.implicits._
    val keys = Seq("", "a", "user-1", "mysql-bin.000001/4321", "πλ-utf8")
    val got = keys.toDF("k")
      .select(col("k"), Fnv1aHash.fnv1a64(col("k")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(got(k) == Sharding.fnv1a64(k.getBytes("UTF-8")), s"key=$k")
    }
  }

  test("TokenSpanHashesAll: positional spans agree with the distinct kernel") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "a", "b", "c", "z")),
      (2L, Seq("a", "b")), // shorter than the window -> empty
      (3L, Seq.empty[String])).toDF("id", "toks")
    val all1 = df.filter(col("id") === 1)
      .select(TokenSpanHashesAll.tokenSpanHashesAll(col("toks"), 3))
      .head().getSeq[Long](0)
    // one hash per window start, repeats preserved at their positions
    assert(all1.size == 5)
    assert(all1(0) == all1(3)) // (a b c) at 0 and 3
    assert(all1.distinct.size == 4)
    // the distinct kernel is exactly first-occurrence order of this one
    val dis1 = df.filter(col("id") === 1)
      .select(TokenSpanHashes.tokenSpanHashes(col("toks"), 3))
      .head().getSeq[Long](0)
    assert(dis1 == all1.distinct)
    // short and empty inputs yield empty span arrays
    val short = df.filter(col("id") > 1)
      .select(TokenSpanHashesAll.tokenSpanHashesAll(col("toks"), 3))
      .collect().map(_.getSeq[Long](0))
    assert(short.forall(_.isEmpty))
  }

  test("NGrams generator: counts, edges, and equivalence to manual shingles") {
    val s = spark
    import s.implicits._
    val df = Seq("a b c d", "x y", "solo", "").toDF("text")
      .select(filter(split(col("text"), " "), x => x =!= "").as("toks"))
    val tri = df.select(NGrams.ngrams(col("toks"), 3).as("ngram"))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(tri == Seq("a b c", "b c d"))
    val uni = df.select(NGrams.ngrams(col("toks"), 1).as("ngram")).count()
    assert(uni == 7) // a b c d x y solo
  }

  test("SumSq aggregator equals its SQL twin") {
    val ssq = udaf(Aggregators.SumSq)
    val got = Tables.lineitem(spark, sf001)
      .agg(ssq(col("l_quantity")).as("x")).collect().head.getLong(0)
    val want = Tables.lineitem(spark, sf001)
      .select(sum(col("l_quantity").cast("long") * col("l_quantity").cast("long")))
      .collect().head.getLong(0)
    assert(got == want)
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = Tables.lineitem(spark, sf001)
      .agg(approx_count_distinct(col("l_partkey"))).collect().head.getLong(0)
    val exact = Tables.lineitem(spark, sf001)
      .agg(count_distinct(col("l_partkey"))).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }
}
