package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The r11 exchange-free iterative-graph pin: PageRank over an edge
  * list landed bucketed+sorted on the source vertex must never shuffle
  * the |E|-sized side inside the iteration loop — the bucket layout IS
  * the join's required distribution. The only hash exchanges left are
  * |V|-sized (rank vector onto the destination key). Also pins
  * prepared-over-bucketed ≡ the raw ranks()/ranksWeighted() path, so
  * the landing is a pure layout change.
  */
class PageRankBucketedSpec extends SparkTestBase {
  import spark.implicits._

  private val rawEdges: Seq[(Long, Long)] = {
    // two chained communities + a hub, enough structure that ranks
    // actually differentiate
    val ring = (0L until 40L).map(i => (i, (i + 1) % 40))
    val hub = (0L until 40L by 2).map(i => (100L, i))
    ring ++ hub
  }

  private def findEdgeScans(p: org.apache.spark.sql.execution.SparkPlan,
      table: String): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == table) => f
    }

  test("iteration loop keeps the bucketed edge side exchange-free") {
    val s = spark
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // pin the DISTRIBUTED loop's plan: disable the r14 local gate
    s.conf.set("spark.graft.pagerank.localEdgeMax", "-1")
    val tbl = "graft_bkt_spec_pr_edges"
    try {
      val raw = rawEdges.toDF("x", "y")
      val dir = Bucketed.materializeOnce(
        PageRank.directedEdges(raw, "x", "y").repartition(4, col("u")),
        tbl, "u", 4)
      val out = PageRank.ranksOnPrepared(dir, iters = 2)
      val plan = out.queryExecution.executedPlan
      // the bucketed scan appears (once per iteration join + degree agg)
      val scans = findEdgeScans(plan, tbl)
      assert(scans.nonEmpty, s"expected bucketed edge scans in:\n$plan")
      assert(plan.toString.contains("Bucketed: true"),
        s"edge scan must report its bucket layout:\n$plan")
      // NO shuffle may sit between the edge scan and its consuming
      // join/aggregate: the bucket layout must satisfy the required
      // distribution directly. (Exchanges HIGHER in the tree — the
      // |V|-sized rank aggregations — transitively contain the scan
      // and are expected; the pin is on the scan-to-consumer path.)
      def scanPaths(p: org.apache.spark.sql.execution.SparkPlan,
          anc: List[org.apache.spark.sql.execution.SparkPlan])
          : Seq[List[org.apache.spark.sql.execution.SparkPlan]] = p match {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == tbl) => Seq(anc)
        case other => other.children.flatMap(c => scanPaths(c, other :: anc))
      }
      scanPaths(plan, Nil).foreach { path =>
        val belowConsumer = path.takeWhile(n =>
          !n.nodeName.contains("Join") && !n.nodeName.contains("Aggregate"))
        val ex = belowConsumer.collect { case e: ShuffleExchangeExec => e }
        assert(ex.isEmpty,
          s"edge scan re-shuffled before its consumer:\n${path.mkString("\n")}")
      }
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      s.conf.unset("spark.graft.pagerank.localEdgeMax")
      s.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("local gate is bit-equal to the distributed loop (all three variants)") {
    // the r14 cost-gate identity: the driver-local rounds must
    // reproduce the distributed BIGINT recursion exactly — fixture has
    // a hub (degree skew), a ring, weights, and a non-vertex seed
    val s = spark
    val raw = rawEdges.toDF("x", "y").withColumn("w",
      (col("x") * 7 + col("y")) % 5 + 1)
    val dir = PageRank.directedEdges(raw, "x", "y", Some("w"))
      .localCheckpoint(true)
    val seeds = Seq(0L, 7L, 100L, 999L).toDF("v")
    def distributed[T](body: => T): T = {
      s.conf.set("spark.graft.pagerank.localEdgeMax", "-1")
      try body finally s.conf.unset("spark.graft.pagerank.localEdgeMax")
    }
    def run(mk: => org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      mk.orderBy("v").as[(Long, Long)].collect().toSeq
    // the gate default (4 M) is far above the fixture, so the un-wrapped
    // calls exercise the LOCAL path
    assert(run(PageRank.ranksOnPrepared(dir.select(col("u"), col("v")), 3))
      === distributed(
        run(PageRank.ranksOnPrepared(dir.select(col("u"), col("v")), 3))))
    assert(run(PageRank.ranksWeightedOnPrepared(dir, 3))
      === distributed(run(PageRank.ranksWeightedOnPrepared(dir, 3))))
    assert(run(PageRank.ranksPersonalizedOnPrepared(
        dir.select(col("u"), col("v")), seeds, 3))
      === distributed(run(PageRank.ranksPersonalizedOnPrepared(
        dir.select(col("u"), col("v")), seeds, 3))))
  }

  test("prepared-over-bucketed ranks equal the raw-path ranks (weighted and not)") {
    val s = spark
    val tbl = "graft_bkt_spec_pr_parity"
    try {
      val raw = rawEdges.toDF("x", "y").withColumn("w",
        (col("x") + col("y")) % 5 + 1)
      val dir = Bucketed.materializeOnce(
        PageRank.directedEdges(raw, "x", "y", Some("w"))
          .repartition(4, col("u")),
        tbl, "u", 4)
      val gotU = PageRank.ranksOnPrepared(dir.select(col("u"), col("v")), 3)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      val wantU = PageRank.ranks(raw, "x", "y", 3)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      assert(gotU === wantU)
      val gotW = PageRank.ranksWeightedOnPrepared(dir, 3)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      val wantW = PageRank.ranksWeighted(raw, "x", "y", "w", 3)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      assert(gotW === wantW)
      val seeds = Seq(0L, 7L, 100L, 999L).toDF("v") // 999 not a vertex
      val gotP = PageRank
        .ranksPersonalizedOnPrepared(dir.select(col("u"), col("v")), seeds, 3)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      val wantP = PageRank.ranksPersonalized(raw, "x", "y", seeds, 3)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      assert(gotP === wantP)
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
