package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphDedupSpec extends SparkTestBase {

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphDedup.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two disjoint components resolve to their min ids") {
    val got = components(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("a chain longer than one hop converges (diameter > 1)") {
    val got = components(Seq((10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L)))
    assert(got.values.toSet == Set(10L))
    assert(got.keySet == Set(10L, 20L, 30L, 40L, 50L))
  }

  test("cycles and duplicate/reversed edges are harmless") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def starComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphDedup.connectedComponentsStar(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star variant matches propagation on chains, cycles, and random graphs") {
    val chain = (0 until 30).map(i => (i * 10L, (i + 1) * 10L)) // diameter 30
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L))
    val rand = (0 until 80).map { i =>
      val a = (i * 6007L) % 50
      val b = (i * 95231L + 7L) % 50
      (a, b)
    }.filter { case (a, b) => a != b }
    val s = spark
    import s.implicits._
    for (edges <- Seq(chain, cycle, rand)) {
      val prop = GraphDedup.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst", maxIter = 200)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = starComponents(edges)
      assert(star == prop, s"star/propagation mismatch on $edges")
    }
  }

  test("star variant converges on a deep chain beyond propagation's default maxIter") {
    // diameter 60 > connectedComponents' default 25 rounds; the star
    // variant needs only O(log n) rounds.
    val deep = (0 until 60).map(i => (i + 1000L, i + 1001L))
    val star = starComponents(deep)
    assert(star.values.toSet == Set(1000L))
    assert(star.size == 61)
  }

  test("propagation falls back to star rounds on a path graph deeper than maxIter") {
    // path graph of diameter 60 > default 25 min-label rounds: the old
    // behavior threw; now it must return CORRECT labels via the
    // star-rounds fallback. Gate forced shut so the DISTRIBUTED
    // propagation loop (not the r10 local union-find) is what's tested.
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    try {
      val deep = (0 until 60).map(i => (i + 1000L, i + 1001L))
      val got = components(deep)
      assert(got.values.toSet == Set(1000L))
      assert(got.keySet == (1000L to 1060L).toSet)
    } finally spark.conf.unset("spark.graft.cc.localEdgeMax")
  }

  test("local union-find equals both distributed forms (r10 gate)") {
    val cases = Seq(
      (0 until 30).map(i => (i * 10L, (i + 1) * 10L)),          // chain
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (7L, 7L)),    // cycle+self
      (0 until 60).map { i =>                                    // random
        val a = (i * 7919L) % 40
        val b = (i * 104729L + 13L) % 40
        (a, b)
      }.filter { case (a, b) => a != b })
    for (edges <- cases) {
      val local = components(edges)      // gate open: union-find
      val localStar = starComponents(edges)
      spark.conf.set("spark.graft.cc.localEdgeMax", "0")
      val (distProp, distStar) =
        try (components(edges), starComponents(edges))
        finally spark.conf.unset("spark.graft.cc.localEdgeMax")
      assert(local === distProp)
      assert(localStar === distStar)
      assert(local === localStar)
    }
  }

  test("labels match the transitive closure on a random graph") {
    // deterministic pseudo-random edges over 40 nodes
    val edges = (0 until 60).map { i =>
      val a = (i * 7919L) % 40
      val b = (i * 104729L + 13L) % 40
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }
    val got = components(edges)
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got == want)
  }
}
