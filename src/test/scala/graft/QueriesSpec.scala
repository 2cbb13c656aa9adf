package graft

/** Smoke-level invariants for the declared query catalog on sf0.001.
  * (Full value-level correctness is the DuckDB oracle gate, replicated
  * locally by tools/check_oracle.py.) */
class QueriesSpec extends SparkTestBase {

  test("catalog integrity: every oracle key has a query; names are q-prefixed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o.diff(q)}")
    assert(q.forall(_.matches("q\\d+_\\w+")))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("known exact invariants at sf0.001") {
    def run(name: String) = SparkEntry.queries(name)(spark, sf001)
    assert(run("q01_scan_count").collect().head.getLong(0) == 6000L)
    assert(run("q13_distinct_exact_twin").collect().head.getLong(0) == 200L)
    assert(run("q15_topk").count() == 20)
    assert(run("q30_similarity_topk").count() == 5)
    assert(run("q31_dedup_exact").count() == 500)
  }

  test("every query executes at sf0.001 (no analysis/runtime errors)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
