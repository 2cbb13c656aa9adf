package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AnalyticsOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- FuzzyJoin ----

  test("selfEditPairs finds within-block typo pairs and collapses counts") {
    val df = Seq(
      "acme corp", "acme corp", "acme corq",   // dist 1, same block (corp/corq share first token)
      "acme ltd",                               // other block
      "zenith corp").toDF("name")
    val pairs = FuzzyJoin.selfEditPairs(df, "name",
        t => split(t, " ").getItem(0), maxDist = 2)
      .orderBy($"name_a", $"name_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // blocks: acme -> {acme corp(2), acme corq(1), acme ltd(1)}, zenith -> {zenith corp}
    // "acme corp" vs "acme corq" dist 1; "acme corp" vs "acme ltd" dist 4 (out);
    assert(pairs === Seq(("acme corp", "acme corq", 1L, 2L, 1L)))
  }

  test("selfEditPairs refuses a degenerate block loudly") {
    val df = (1 to 50).map(i => s"name$i").toDF("name")
    val e = intercept[Exception] {
      FuzzyJoin.selfEditPairs(df, "name", _ => lit(""), maxDist = 1,
        maxBlockRows = 10).count()
    }
    assert(e.getMessage.contains("maxBlockRows"))
  }

  test("selfEditPairs keeps a pair at exactly maxDist (length prune is safe)") {
    val df = Seq("ab x", "abcd x").toDF("name") // dist 2, len diff 2
    val pairs = FuzzyJoin.selfEditPairs(df, "name",
        t => split(t, " ").getItem(1), maxDist = 2)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2, p._3)) === Seq(("ab x", "abcd x", 2L)))
  }

  // ---- Funnel ----

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("funnel enforces strict temporal order per entity") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full
      (2L, 10L, "click"), (2L, 20L, "view"),                        // click BEFORE view: stage2 unreached
      (3L, 10L, "view"),                                            // view only
      (4L, 10L, "view"), (4L, 20L, "purchase"),                     // skips click: purchase not counted
      (5L, 50L, "error"))                                           // never enters
    val r = Funnel.report(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r === ((5L, 4L, 1L, 1L)))
  }

  test("funnel drops NULL entities (slim-stream rewrite keeps the inner-join semantics)") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (java.lang.Long.valueOf(1L), 10L, "view"),
      (null.asInstanceOf[java.lang.Long], 20L, "view"),
      (java.lang.Long.valueOf(2L), 30L, "error"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.report(events, "user_id", "ts", "event_type",
        Seq("view", "click")).as[(Long, Long, Long)].collect().head
    // entities = {1, 2}; the NULL row is not an entity (pre-r11 inner
    // join semantics, pinned after the left-join rewrite)
    assert(r === ((2L, 1L, 0L)))
  }

  test("packed pairs equal struct pairs and refuse out-of-range ids") {
    val s = spark
    import s.implicits._
    val b = CoOccur.baskets(
      Seq((1L, 5L), (1L, 9L), (1L, 7L), (2L, 9L), (2L, 5L))
        .toDF("g", "item"), "g", "item")
    val viaStruct = CoOccur.pairsFromBaskets(b)
      .as[(Long, Long)].collect().toSeq.sorted
    val viaPacked = CoOccur.packedPairsFromBaskets(b)
      .select(expr("shiftright(pk, 32)"), expr("pk % 4294967296"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(viaPacked === viaStruct)
    // negative id: the in-plan guard must fire (review fix — a negative
    // id would pack to a corrupted key without it)
    val neg = CoOccur.baskets(
      Seq((1L, -5L), (1L, 9L)).toDF("g", "item"), "g", "item")
    val e = intercept[Exception](
      CoOccur.packedPairsFromBaskets(neg).collect())
    assert(e.getMessage.contains("outside [0, 2^31)"), e.getMessage)
    // over 2^31: same
    val big = CoOccur.baskets(
      Seq((1L, 5L), (1L, 3000000000L)).toDF("g", "item"), "g", "item")
    val e2 = intercept[Exception](
      CoOccur.packedPairsFromBaskets(big).collect())
    assert(e2.getMessage.contains("outside [0, 2^31)"), e2.getMessage)
  }

  test("funnel stage time must be strictly after the prior stage") {
    val events = ev((1L, 10L, "view"), (1L, 10L, "click"))
    val r = Funnel.report(events, "user_id", "ts", "event_type",
        Seq("view", "click")).as[(Long, Long, Long)].collect().head
    assert(r === ((1L, 1L, 0L)))
    // and a later click converts
    val r2 = Funnel.report(ev((1L, 10L, "view"), (1L, 11L, "click")),
        "user_id", "ts", "event_type", Seq("view", "click"))
      .as[(Long, Long, Long)].collect().head
    assert(r2 === ((1L, 1L, 1L)))
  }

  test("funnel picks the earliest qualifying event, not any") {
    // second view at 30 is irrelevant; click at 20 is after the FIRST view
    val events = ev((1L, 10L, "view"), (1L, 30L, "view"), (1L, 20L, "click"))
    val st = Funnel.stageTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click")).as[(Long, Long, Long)].collect().head
    assert(st === ((1L, 10L, 20L)))
  }

  // ---- Triangles ----

  private def edges(rows: (Long, Long)*) = rows.toDF("s", "t")

  test("K4 has 4 triangles; duplicates, reversals, self-loops ignored") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L), (2L, 3L), (1L, 1L)) // reversal + dup + self-loop
    val r = Triangles.count(k4, "s", "t")
      .as[(Long, Long, Long)].collect().head
    assert(r === ((4L, 6L, 4L)))
  }

  test("a star graph has no triangles despite the hub") {
    val star = edges((1 to 20).map(i => (0L, i.toLong)): _*)
    val r = Triangles.count(star, "s", "t")
      .as[(Long, Long, Long)].collect().head
    assert(r === ((21L, 20L, 0L)))
  }

  // ---- SessionPaths ----

  private val M = 60L * 1000000000L // one minute in ns

  test("session paths split on the gap and order by (ts, tie)") {
    val events = Seq(
      (1L, 1L * M, 10L, "view"), (1L, 2L * M, 11L, "click"),
      (1L, 45L * M, 12L, "view"),                 // > 30 min gap: new session
      (2L, 1L * M, 20L, "purchase")).toDF("user_id", "ts", "event_id", "event_type")
    val p = SessionPaths.paths(events, "user_id", "ts", "event_id",
        "event_type", gapNs = 30L * M)
      .orderBy($"user_id", $"sid")
      .select($"user_id", $"sid", $"path")
      .as[(Long, Long, String)].collect().toSeq
    assert(p === Seq((1L, 0L, "view>click"), (1L, 1L, "view"), (2L, 0L, "purchase")))
  }

  test("same-ts events order by the tie column, invariant to partitioning") {
    val events = Seq(
      (1L, 5L * M, 3L, "c"), (1L, 5L * M, 1L, "a"), (1L, 5L * M, 2L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    for (df <- Seq(events, events.repartition(5))) {
      val p = SessionPaths.paths(df, "user_id", "ts", "event_id",
          "event_type", gapNs = 30L * M)
        .select($"path").as[String].collect().toSeq
      assert(p === Seq("a>b>c"))
    }
  }

  test("topPaths ranks by count with a path tie-break") {
    val events = (for {
      u <- 1L to 3L
    } yield Seq((u, 1L * M, u * 10, "view"), (u, 2L * M, u * 10 + 1, "click")))
      .flatten.toDF("user_id", "ts", "event_id", "event_type")
    val top = SessionPaths.topPaths(events, "user_id", "ts", "event_id",
        "event_type", gapNs = 30L * M, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(top === Seq(("view>click", 3L)))
  }

  // ---- CoOccur ----

  test("in-row pair generation dedups within group and orders a < b") {
    val df = Seq((1L, 3L), (1L, 1L), (1L, 3L), (1L, 2L), (2L, 9L), (2L, 7L))
      .toDF("g", "item")
    val p = CoOccur.pairs(df, "g", "item")
      .orderBy($"a", $"b").as[(Long, Long)].collect().toSeq
    assert(p === Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 9L)))
  }

  test("pair multiplicity counts one occurrence per group") {
    val df = Seq((1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L), (3L, 5L)).toDF("g", "item")
    val c = CoOccur.pairs(df, "g", "item")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(c === Seq((5L, 6L, 2L)))
  }

  test("apriori pruning preserves the floored pair counts exactly") {
    // long-tail corpus: items 1,2 co-occur in 3 groups (frequent);
    // items 7,8,9 each appear once (below any floor >= 2) and would
    // naively still pay pair fan-out
    val df = Seq(
      (1L, 1L), (1L, 2L), (1L, 7L),
      (2L, 1L), (2L, 2L), (2L, 8L),
      (3L, 1L), (3L, 2L), (3L, 9L)).toDF("g", "item")
    val floor = 3L
    def flooredPairs(b: org.apache.spark.sql.DataFrame) =
      CoOccur.pairsFromBaskets(b)
        .groupBy($"a", $"b").agg(count(lit(1)).as("c_ab"))
        .filter($"c_ab" >= floor)
        .orderBy($"a", $"b").as[(Long, Long, Long)].collect().toSeq
    val b = CoOccur.baskets(df, "g", "item")
    val pruned = CoOccur.pruneInfrequentItems(b, floor)
    // pruning is non-vacuous: the tail items are gone from the baskets
    assert(pruned.select(explode($"ps")).as[Long].collect().toSet
      === Set(1L, 2L))
    // and answer-identical under the pair-support floor
    assert(flooredPairs(pruned) === flooredPairs(b))
    assert(flooredPairs(b) === Seq((1L, 2L, 3L)))
  }

  test("apriori pruning drops groups left with fewer than two items") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 9L), (3L, 1L), (3L, 2L))
      .toDF("g", "item")
    // item 9 appears once; group 2 degenerates to [1] and must vanish
    val pruned = CoOccur.pruneInfrequentItems(
      CoOccur.baskets(df, "g", "item"), 2L)
    assert(pruned.select($"g").as[Long].collect().toSet === Set(1L, 3L))
  }

  // ---- IntervalSweep ----

  test("sweep finds the peak and its earliest instant") {
    val iv = Seq((0L, 10L), (5L, 15L), (9L, 12L)).toDF("t0", "t1")
    val r = IntervalSweep.maxConcurrent(iv, "t0", "t1")
      .as[(Long, Long)].collect().head
    assert(r === ((3L, 9L)))
  }

  test("sweep is end-exclusive: touching intervals never overlap") {
    val iv = Seq((0L, 5L), (5L, 10L)).toDF("t0", "t1")
    val r = IntervalSweep.maxConcurrent(iv, "t0", "t1")
      .as[(Long, Long)].collect().head
    assert(r === ((1L, 0L)))
  }

  test("sweep result is invariant to input partitioning") {
    val base = (1 to 200).map(i => (i.toLong % 37, i.toLong % 37 + 1 + i % 5))
    val a = IntervalSweep.maxConcurrent(base.toDF("t0", "t1"), "t0", "t1")
      .as[(Long, Long)].collect().head
    val b = IntervalSweep.maxConcurrent(
        scala.util.Random.shuffle(base).toDF("t0", "t1").repartition(11),
        "t0", "t1")
      .as[(Long, Long)].collect().head
    assert(a === b)
  }

  // ---- PageRank ----

  test("a cycle is an exact fixed point of integer PageRank") {
    // symmetric 6-cycle: contrib = 1e6 div 2 twice, pr' = 150000 +
    // (17*1e6) div 20 = 1e6 — every iteration reproduces the start
    // mass exactly, no truncation drift
    val cyc = edges((0 to 5).map(i => (i.toLong, ((i + 1) % 6).toLong)): _*)
    val prs = PageRank.ranks(cyc, "s", "t", iters = 4)
      .select($"pr").as[Long].collect().toSet
    assert(prs === Set(1000000L))
  }

  test("the hub of a star outranks its leaves, deterministically") {
    val star = edges((1 to 10).map(i => (0L, i.toLong)): _*)
    val r = PageRank.ranks(star, "s", "t", iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    val (hub, leaves) = (r.head._2, r.tail.map(_._2).toSet)
    assert(leaves.size === 1 && hub > leaves.head)
    val again = PageRank.ranks(star.repartition(5), "s", "t", iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(again === r)
  }

  test("uniform weights reduce weighted PageRank to the unweighted form") {
    // (pr·w) div (w·d) == pr div d exactly (same rational under floor),
    // so a constant weight must reproduce ranks() bit-for-bit
    val es = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val un = PageRank.ranks(es, "s", "t", iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    val wd = PageRank.ranksWeighted(es.withColumn("w", lit(7L)),
        "s", "t", "w", iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(wd === un)
  }

  test("all-vertex seeds reduce personalized PageRank to the global form") {
    // [v∈S] = 1 everywhere makes the personalized recursion EXACTLY
    // q118's: init 1e6 and restart 150000 on every vertex
    val es = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val allV = es.select($"s".as("v")).union(es.select($"t".as("v"))).distinct()
    val per = PageRank.ranksPersonalized(es, "s", "t", allV, iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    val glob = PageRank.ranks(es, "s", "t", iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(per === glob)
  }

  test("personalized mass concentrates around the seed") {
    // path 1-2-3-4-5-6, seed {1}: the seed dominates every other
    // vertex and the far end gets the least mass (strict monotone
    // decay does NOT hold at finite iterations — mass travels the path
    // in waves, so mid-path ranks can locally invert; the seed-max /
    // far-min envelope is the stable property)
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val pr = PageRank.ranksPersonalized(path, "s", "t",
        Seq(1L).toDF("v"), iters = 6)
      .orderBy($"v").as[(Long, Long)].collect().toMap
    assert((2L to 6L).forall(v => pr(1L) > pr(v)), pr.toString)
    assert((1L to 5L).forall(v => pr(v) > pr(6L)), pr.toString)
    // a seed outside the graph contributes nothing: same as no seed
    val none = PageRank.ranksPersonalized(path, "s", "t",
        Seq(999L).toDF("v"), iters = 3)
      .select($"pr").as[Long].collect().toSet
    assert(none === Set(0L))
  }

  test("a heavier edge pulls proportionally more mass") {
    val es = Seq((0L, 1L, 100L), (0L, 2L, 1L), (0L, 3L, 1L), (0L, 4L, 1L))
      .toDF("s", "t", "w")
    val pr = PageRank.ranksWeighted(es, "s", "t", "w", iters = 3)
      .orderBy($"v").as[(Long, Long)].collect().toMap
    assert(pr(1L) > pr(2L) && pr(2L) === pr(3L))
  }

  test("triangle count is invariant to edge order and partitioning") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
      (5L, 6L), (1L, 6L))
    val a = Triangles.count(es.toDF("s", "t"), "s", "t")
      .as[(Long, Long, Long)].collect().head
    val b = Triangles.count(
        scala.util.Random.shuffle(es).toDF("s", "t").repartition(7), "s", "t")
      .as[(Long, Long, Long)].collect().head
    assert(a === b && a._3 === 2L)
  }
}
