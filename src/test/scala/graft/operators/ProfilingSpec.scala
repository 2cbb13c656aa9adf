package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkTestBase {

  private val cols = Seq("l_orderkey", "l_partkey", "l_quantity")

  test("one-pass and per-column forms produce identical profiles") {
    val li = Tables.lineitem(spark, sf001)
    val a = Profiling.profileOnePass(li, cols).orderBy("col_name").collect().toSeq
    val b = Profiling.profilePerColumn(li, cols).orderBy("col_name").collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[String]("col_name")) == cols.sorted)
    val n = li.count()
    assert(a.forall(_.getAs[Long]("n_rows") == n))
  }

  test("profile counts nulls and distincts exactly") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, null), (2L, 10L), (null, 30L), (2L, null))
      .toDF("a", "b")
    for (form <- Seq(Profiling.profileOnePass(df, Seq("a", "b")),
        Profiling.profilePerColumn(df, Seq("a", "b")))) {
      val m = form.collect().map(r => r.getAs[String]("col_name") -> r).toMap
      assert(m("a").getAs[Long]("n_rows") == 5)
      assert(m("a").getAs[Long]("n_nonnull") == 4)
      assert(m("a").getAs[Long]("n_distinct") == 2)
      assert(m("a").getAs[Double]("min_d") == 1.0 && m("a").getAs[Double]("max_d") == 2.0)
      assert(m("b").getAs[Long]("n_nonnull") == 3)
      assert(m("b").getAs[Long]("n_distinct") == 2)
      assert(m("b").getAs[Double]("max_d") == 30.0)
    }
  }

  test("cost gate: per-column below the threshold, Expand one-pass above") {
    val li = Tables.lineitem(spark, sf001)
    val small = Profiling.profile(li, cols) // fixture ≪ 256 MB estimate
    assert(!small.queryExecution.executedPlan.toString.contains("Expand"))
    val forced = Profiling.profile(li, cols, onePassThresholdBytes = 0L)
    val p = forced.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p)
    assert("FileScan parquet".r.findAllMatchIn(p).length == 1,
      s"one-pass form must read the table once:\n$p")
    // and the two gate arms agree on the answer
    assert(small.orderBy("col_name").collect().toSeq ==
      forced.orderBy("col_name").collect().toSeq)
  }
}
