package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private def docs(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
  }

  test("hashSample: deterministic, rate-monotone, membership-stable under growth") {
    val d1 = docs(400)
    val at = (r: Long) => Sampling.hashSample(d1, "doc_id", lit(r))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lo = at(200000L); val hi = at(600000L)
    assert(at(200000L) == lo) // deterministic
    assert(lo.subsetOf(hi))   // nested samples as the rate grows
    assert(lo.nonEmpty && hi.size < 400)
    // growth stability: the same rate over a LARGER corpus keeps every
    // previously kept doc (per-doc decision depends only on its own id)
    val grown = Sampling.hashSample(docs(800), "doc_id", lit(200000L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(grown))
  }

  test("balancedByGroup downsamples every group to ~the smallest") {
    val s = spark
    import s.implicits._
    // skewed groups: 300 en, 60 de, 40 fr
    val d = ((0 until 300).map(i => (i.toLong, "en")) ++
      (1000 until 1060).map(i => (i.toLong, "de")) ++
      (2000 until 2040).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val rates = Sampling.balancedRates(d, "lang").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rates("fr") == (40L, 1000000L)) // smallest group keeps all
    assert(rates("en")._2 == 40L * 1000000L / 300L)
    val kept = Sampling.balancedByGroup(d, "lang", "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 40L)
    // hash-rate sampling lands near the target (binomial spread around
    // 40); the DETERMINISTIC value is pinned by the q104 oracle — here
    // we only require the balancing effect
    assert(kept("en") <= 80L && kept("de") <= 80L)
    // output carries the input's own columns, no internals
    assert(Sampling.balancedByGroup(d, "lang", "doc_id").columns.toSeq
      .sorted == Seq("doc_id", "lang"))
  }

  test("topKByPriority: exact k per group, invariant to partitioning and order") {
    val d = docs(400)
    val base = Sampling.topKByPriority(d, "lang", "doc_id", 10)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(base.groupBy(_._1).values.forall(_.size == 10))
    // scramble physical layout: random shuffle + odd partitioning must
    // not change the sample (a true reservoir would)
    val scrambled = Sampling.topKByPriority(
        d.repartition(7, col("doc_id") % 3).sortWithinPartitions(col("doc_id").desc),
        "lang", "doc_id", 10)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(scrambled == base)
    // groups smaller than k keep everything
    val tiny = Sampling.topKByPriority(docs(8), "lang", "doc_id", 10)
    assert(tiny.count() == 8)
  }

  test("topKByPriority plans as WindowGroupLimit (partial top-k before the exchange)") {
    val plan = Sampling.topKByPriority(docs(400), "lang", "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
