package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class HistoryGraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Scd2 ----

  private def hist(rows: (Long, Long, Long, String)*) =
    rows.toDF("ent", "t", "tie", "v")

  test("scd2 collapses runs and chains effective dates") {
    val scd = Scd2.build(hist(
        (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
        (1L, 40L, 4L, "B"), (1L, 50L, 5L, "A")),
      "ent", "t", "tie", "v")
      .orderBy($"version")
      .as[(Long, String, Long, Long, Option[Long])].collect().toSeq
    assert(scd === Seq(
      (1L, "A", 1L, 10L, Some(30L)),
      (1L, "B", 2L, 30L, Some(50L)),
      (1L, "A", 3L, 50L, None)))
  }

  test("scd2 orders same-instant rows by the tie column") {
    val scd = Scd2.build(hist(
        (1L, 10L, 2L, "B"), (1L, 10L, 1L, "A")),
      "ent", "t", "tie", "v")
      .orderBy($"version")
      .as[(Long, String, Long, Long, Option[Long])].collect().toSeq
    assert(scd.map(_._2) === Seq("A", "B"))
  }

  test("scd2 opens version 1 when the entity's first tracked value is NULL") {
    // lag() is NULL both for "no previous row" and "previous value was
    // NULL" — the first event must still open version 1, and the later
    // NULL→A transition must open version 2 (the ADVICE r9 regression).
    val scd = Scd2.build(
      Seq[(Long, Long, Long, Option[String])](
        (1L, 10L, 1L, None), (1L, 20L, 2L, None), (1L, 30L, 3L, Some("A")))
        .toDF("ent", "t", "tie", "v"),
      "ent", "t", "tie", "v")
      .orderBy($"version")
      .as[(Long, Option[String], Long, Long, Option[Long])].collect().toSeq
    assert(scd === Seq(
      (1L, None, 1L, 10L, Some(30L)),
      (1L, Some("A"), 2L, 30L, None)))
  }

  test("scd2 asOf returns exactly the effective version") {
    val scd = Scd2.build(hist(
        (1L, 10L, 1L, "A"), (1L, 30L, 2L, "B")),
      "ent", "t", "tie", "v")
    assert(Scd2.asOf(scd, lit(29L)).select($"v").as[String].collect().toSeq
      === Seq("A"))
    assert(Scd2.asOf(scd, lit(30L)).select($"v").as[String].collect().toSeq
      === Seq("B")) // eff_from <= at < eff_to: boundary belongs to the opener
    assert(Scd2.asOf(scd, lit(5L)).count() === 0)
  }

  test("scd2 point-in-time join skips zero-width same-instant versions") {
    // two same-instant changes: version 1 is zero-width (eff_from ==
    // eff_to) — a probe AT that instant must hit only version 2 (the
    // end-exclusive interval), so every fact matches exactly one row
    val dim = Scd2.build(hist(
        (1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 40L, 3L, "C")),
      "ent", "t", "tie", "v")
    assert(Scd2.asOf(dim, lit(10L)).select($"v").as[String].collect().toSeq
      === Seq("B"))
    assert(Scd2.asOf(dim, lit(39L)).select($"v").as[String].collect().toSeq
      === Seq("B"))
    assert(Scd2.asOf(dim, lit(40L)).select($"v").as[String].collect().toSeq
      === Seq("C"))
  }

  test("scd2 asOfSameSource equals the PIT join when facts are the change stream") {
    // the r14 q134 rewrite's identity, pinned on the nasty fixture:
    // same-instant changes (zero-width version), a NULL tracked value,
    // runs that collapse, and two entities — every source row stamped
    // with the version effective AT ITS OWN INSTANT must equal the
    // end-exclusive interval join against the built dimension
    val src = Seq[(Long, Long, Long, Option[String])](
      (1L, 10L, 1L, Some("A")), (1L, 10L, 2L, Some("B")), // zero-width v1
      (1L, 20L, 3L, Some("B")),                           // run continues
      (1L, 30L, 4L, None),                                // NULL tracked
      (1L, 30L, 5L, Some("C")),                           // zero-width v3
      (1L, 40L, 6L, Some("C")),
      (2L, 15L, 1L, Some("X")), (2L, 15L, 2L, Some("X")))
      .toDF("ent", "t", "tie", "v")
    val dim = Scd2.build(src, "ent", "t", "tie", "v")
    val viaJoin = src.select($"ent".as("f_ent"), $"t".as("f_t"),
        $"tie".as("f_tie"))
      .join(dim, $"f_ent" === $"ent" && $"eff_from" <= $"f_t" &&
        ($"eff_to".isNull || $"eff_to" > $"f_t"))
      .select($"f_ent", $"f_t", $"f_tie", $"version", $"v")
      .as[(Long, Long, Long, Long, Option[String])].collect().toSeq.sorted
    val viaWindow = Scd2.asOfSameSource(src, "ent", "t", "tie", "v")
      .select($"ent", $"t", $"tie", $"version", $"v")
      .as[(Long, Long, Long, Long, Option[String])].collect().toSeq.sorted
    assert(viaJoin === viaWindow)
    assert(viaWindow.size === 8) // every fact matched exactly once
    // the same-instant fact at (1, 10) adopts the LAST same-instant
    // version (tie 2 opened v2) for BOTH tie rows — the zero-width skip
    assert(viaWindow.filter(r => r._1 == 1L && r._2 == 10L)
      .map(_._4).toSet === Set(2L))
  }

  // ---- Bfs ----

  test("bfs hop distances from multiple seeds, min over paths") {
    // 1-2-3-4 path plus 10-3 shortcut; seeds {1, 10}
    val dir0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L))
      .toDF("a", "b")
    val dir = dir0.select($"a".as("u"), $"b".as("v"))
      .unionAll(dir0.select($"b".as("u"), $"a".as("v")))
    val seeds = Seq(1L, 10L).toDF("v")
    val got = Bfs.hops(dir, "u", "v", seeds, maxHops = 5)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    // 3 is 1 hop from seed 10 (not 2 hops from seed 1); 4 is 2 hops
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (10L, 0L)))
  }

  test("bfs early-stops at the fixed point and caps at maxHops") {
    val dir0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val dir = dir0.select($"a".as("u"), $"b".as("v"))
      .unionAll(dir0.select($"b".as("u"), $"a".as("v")))
    val seeds = Seq(1L).toDF("v")
    // disconnected {5,6} never appears; generous budget == tight budget
    val full = Bfs.hops(dir, "u", "v", seeds, maxHops = 50)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(full === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
    // cap cuts the ring at maxHops
    val capped = Bfs.hops(dir, "u", "v", seeds, maxHops = 2)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(capped === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("bfs local traversal equals the distributed frontier loop") {
    // The r10 cost-gated local finish must be bit-equal to the
    // frontier-join unroll on: min-over-paths, isolated seeds (present
    // at dist 0), capped budgets, and the q135 fixture graph.
    val dir0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L)).toDF("a", "b")
    val dir = dir0.select($"a".as("u"), $"b".as("v"))
      .unionAll(dir0.select($"b".as("u"), $"a".as("v")))
    val li = graft.Tables.lineitem(spark, sf001)
      .filter($"l_orderkey" % 8 === 0)
    val e0 = CoOccur.pairs(li, "l_orderkey", "l_partkey")
    val eq = e0.select($"a".as("u"), $"b".as("v"))
      .unionAll(e0.select($"b".as("u"), $"a".as("v")))
    val fixSeeds = eq.select($"u").distinct().filter($"u" % 97 === 0)
    for ((e, seeds, cap) <- Seq(
        (dir, Seq(1L, 10L, 99L).toDF("v"), 5), // 99: isolated seed
        (dir, Seq(1L).toDF("v"), 2),           // capped mid-traversal
        (eq, fixSeeds, 3))) {
      val local = Bfs.hops(e, "u", "v", seeds, cap)
        .orderBy($"v").as[(Long, Long)].collect().toSeq
      val distr = Bfs.hopsDistributed(
          e.select($"u".as("__u"), $"v".as("__v")), seeds, cap)
        .orderBy($"v").as[(Long, Long)].collect().toSeq
      assert(local === distr)
    }
  }

  // ---- Changepoint ----

  private def series(rows: (String, Long, Long)*) =
    rows.toDF("ent", "b", "n")

  test("changepoint finds the level shift, not the ends") {
    val r = Changepoint.split(series(
        ("x", 1L, 1L), ("x", 2L, 1L), ("x", 3L, 1L),
        ("x", 4L, 9L), ("x", 5L, 9L), ("x", 6L, 9L)),
      "ent", "b", "n")
      .as[(String, Long, Long, Long)].collect().toSeq
    // D_k = |6*S_k - k*30|: 24, 48, 72, 48, 24, 0 -> argmax after bucket 3
    assert(r === Seq(("x", 3L, 72L, 6L)))
  }

  test("changepoint tie resolves to the earliest bucket") {
    val r = Changepoint.split(series(
        ("x", 1L, 5L), ("x", 2L, 5L)), "ent", "b", "n")
      .as[(String, Long, Long, Long)].collect().toSeq
    // D_1 = |2*5 - 1*10| = 0 = D_2 -> earliest bucket wins
    assert(r === Seq(("x", 1L, 0L, 2L)))
  }

  test("changepoint single-bucket series reports zero drift") {
    val r = Changepoint.split(series(("y", 7L, 42L)), "ent", "b", "n")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("y", 7L, 0L, 1L)))
  }

  // ---- KCore ----

  private def edges(rows: (Long, Long)*) = rows.toDF("a", "b")

  test("kcore keeps the clique, peels the tail cascade") {
    // K4 on {1,2,3,4} plus a path 4-5-6: at k=3 the path peels away
    // over successive rounds, the clique is the fixed point.
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val core = KCore.peel(e, "a", "b", k = 3, rounds = 4)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("kcore of a path at k=2 peels to empty") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(KCore.peel(e, "a", "b", k = 2, rounds = 4).count() === 0)
  }

  test("kcore ignores duplicates, reversals, self-loops") {
    val e = edges((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L),
      (1L, 3L), (2L, 3L))
    val core = KCore.peel(e, "a", "b", k = 2, rounds = 2)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kcore early-stop equals the full unroll past the fixed point") {
    // K4 + tail converges in 2 peels; a generous budget must change
    // nothing (the early-stop is answer-invisible — rounds past the
    // fixed point are the identity, the loop just skips running them)
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    def run(r: Int) = KCore.peel(e, "a", "b", k = 3, rounds = r)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(run(2) === run(20))
    assert(run(20) === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("kcore local finish and delta peeling equal the recompute form") {
    // Three forms, one answer: the driver-local synchronized finish
    // (default gate), the broadcast delta rounds (gate forced shut via
    // localEdgeMax=0), and the r9 full-recompute loop (peelNaive) —
    // on cascading peels, full evictions, a CAPPED budget (rounds=1,
    // mid-peel state must match too), and the q130 fixture graph.
    val cascade = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val li = graft.Tables.lineitem(spark, sf001)
      .filter($"l_orderkey" % 8 === 0)
    val eq = CoOccur.pairs(li, "l_orderkey", "l_partkey")
    def run(df: org.apache.spark.sql.DataFrame, k: Int, r: Int,
        form: String): Seq[(Long, Long)] = form match {
      case "local" =>
        KCore.peel(df, "a", "b", k, r)
          .orderBy($"v").as[(Long, Long)].collect().toSeq
      case "delta" =>
        spark.conf.set("spark.graft.kcore.localEdgeMax", "0")
        try KCore.peel(df, "a", "b", k, r)
          .orderBy($"v").as[(Long, Long)].collect().toSeq
        finally spark.conf.unset("spark.graft.kcore.localEdgeMax")
      case _ =>
        KCore.peelNaive(df, "a", "b", k, r)
          .orderBy($"v").as[(Long, Long)].collect().toSeq
    }
    for ((e, k, r) <- Seq((cascade, 3, 8), (cascade, 3, 1), (cascade, 2, 8),
        (path, 2, 8), (path, 2, 1), (eq, 8, 8))) {
      val naive = run(e, k, r, "naive")
      assert(run(e, k, r, "local") === naive, s"local != naive at k=$k r=$r")
      assert(run(e, k, r, "delta") === naive, s"delta != naive at k=$k r=$r")
    }
  }

  test("q130's fixture graph reaches its fixed point inside the bound") {
    // The declared semantics are "after exactly 8 peels"; this pins the
    // stronger fact that 8 ≡ the true 8-core at the smallest fixture
    // (rounds 7 and 8 agree), so the query really reports a k-core.
    val li = graft.Tables.lineitem(spark, sf001)
      .filter($"l_orderkey" % 8 === 0)
    val e = CoOccur.pairs(li, "l_orderkey", "l_partkey")
    val r7 = KCore.peel(e, "a", "b", k = 8, rounds = 7)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    val r8 = KCore.peel(e, "a", "b", k = 8, rounds = 8)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(r7 === r8)
    assert(r8.nonEmpty && r8.forall(_._2 >= 8))
  }
}
