package graft

import org.apache.spark.sql.functions._

/** q124's size gate (r12): both plans — the floor-optimal per-
  * relationship anti-joins and the scan-dominated single-scan
  * group-table audit — must produce identical rows on the fixture. */
class FkAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def run(): Seq[(String, Long, Long)] =
    SparkEntry.queries("q124_fk_orphans")(spark, sf001)
      .orderBy(col("rel"))
      .as[(String, Long, Long)].collect().toSeq

  test("anti-join path ≡ single-scan path (size gate, r12)") {
    val key = "spark.graft.fkaudit.singleScanMinBytes"
    spark.conf.set(key, Long.MaxValue.toString) // force anti-join path
    val anti = run()
    spark.conf.set(key, "0") // force single-scan path
    val single = run()
    spark.conf.unset(key)
    assert(anti === single)
    assert(anti.map(_._1) === Seq("lineitem->orders", "lineitem->part",
      "lineitem->supplier", "orders->customer"))
    // healthy fixture: zero orphans everywhere, positive child counts
    assert(anti.forall(_._3 == 0L))
    assert(anti.forall(_._2 > 0L))
  }
}
