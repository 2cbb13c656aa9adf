package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- LineDedup ----

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("line dedup keeps the globally first occurrence only") {
    val d = docs(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),     // beta already seen in doc 1
      (3L, "delta\nalpha"))    // both seen
    val r = LineDedup.rebuild(d).orderBy($"doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(r === Seq(
      (1L, 3L, 3L, 0L, "alpha\nbeta\ngamma"),
      (2L, 2L, 1L, 1L, "delta"),
      (3L, 2L, 0L, 2L, "")))
  }

  test("line dedup first-occurrence tie breaks on (doc_id, idx)") {
    // the same line twice INSIDE one doc: idx 0 wins, idx 2 drops
    val d = docs((5L, "x\ny\nx"))
    val r = LineDedup.rebuild(d)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(r === Seq((5L, 3L, 2L, 1L, "x\ny")))
  }

  test("line dedup preserves original line order in the rebuild") {
    val d = docs((1L, "z"), (2L, "c\nz\na\nz\nb"))
    val r = LineDedup.rebuild(d).orderBy($"doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 2 keeps c,a,b in their original relative positions
    assert(r(1) === (2L, 5L, 3L, 2L, "c\na\nb"))
  }

  test("fused chunked rebuild ≡ rebuild ∘ withChunkedLines (r12 fusion pin)") {
    // fixture-corpus slice: real text, ragged token counts, empty docs
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .filter($"doc_id" < 120)
      .select($"doc_id", $"text")
      .unionByName(docs((9001L, ""), (9002L, "one two three four")))
    for (w <- Seq(3, 8)) {
      val unfused = LineDedup.rebuild(
          LineDedup.withChunkedLines(d, "text", w))
        .orderBy($"doc_id")
        .as[(Long, Long, Long, Long, String)].collect().toSeq
      val fused = LineDedup.rebuildChunked(d, "text", w)
        .orderBy($"doc_id")
        .as[(Long, Long, Long, Long, String)].collect().toSeq
      assert(fused === unfused, s"w=$w")
    }
  }

  // ---- TableDiff ----

  test("table diff classifies added, deleted, changed, unchanged") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("k0", "s", "n")
    val b = Seq((2L, "y", 20L), (3L, "z", 31L), (4L, "w", 40L))
      .toDF("k0", "s", "n")
    val r = TableDiff.diff(a, b, "k0").orderBy($"k")
      .as[(Long, String)].collect().toSeq
    assert(r === Seq((1L, "deleted"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("table diff separates NULL from empty and from boundary shifts") {
    // (a) NULL vs '' must differ; (b) ("ab","c") vs ("a","bc") must
    // differ (the length-prefix framing prevents boundary aliasing)
    val a = Seq((1L, Some(""), "q"), (2L, Some("ab"), "c"))
      .toDF("k0", "s1", "s2")
    val b = Seq((1L, None: Option[String], "q"), (2L, Some("a"), "bc"))
      .toDF("k0", "s1", "s2")
    val r = TableDiff.diff(a, b, "k0").orderBy($"k")
      .as[(Long, String)].collect().toSeq
    assert(r === Seq((1L, "changed"), (2L, "changed")))
  }

  test("diff fingerprint: (x, NULL) never aliases (NULL, x) (r13)") {
    // xxhash64 skips NULL inputs, so without the per-column null-flag
    // prefix these two rows would hash identically and misclassify as
    // `unchanged`
    val a = Seq((1L, Some("x"), None: Option[String])).toDF("k0", "c1", "c2")
    val b = Seq((1L, None: Option[String], Some("x"))).toDF("k0", "c1", "c2")
    val r = TableDiff.diff(a, b, "k0")
      .as[(Long, String)].collect().toSeq
    assert(r === Seq((1L, "changed")))
  }

  test("diff -> apply round-trips to the new snapshot exactly") {
    // adds, deletes, changes, NULL payloads — the reconstruction must
    // equal `newer` as a row multiset
    val older = Seq((1L, Some("x"), 10L), (2L, Some("y"), 20L),
      (3L, None: Option[String], 30L)).toDF("k0", "s", "n")
    val newer = Seq((2L, Some("y"), 20L), (3L, Some("z"), 30L),
      (4L, None: Option[String], 40L)).toDF("k0", "s", "n")
    val rebuilt = TableDiff.applyChanges(older,
        TableDiff.changeSet(older, newer, "k0"), "k0")
      .orderBy($"k0").as[(Long, Option[String], Long)].collect().toSeq
    val want = newer.orderBy($"k0")
      .as[(Long, Option[String], Long)].collect().toSeq
    assert(rebuilt === want)
  }

  // ---- LabelProp ----

  private def edges(rows: (Long, Long)*) = rows.toDF("a", "b")

  test("label propagation pulls a pendant into its clique's community") {
    // triangle {1,2,3} + pendant 4-3: after 2 sweeps all carry label 1
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val r = LabelProp.run(e, "a", "b", rounds = 2).orderBy($"v")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("label propagation tie resolves to the smallest label") {
    // vertex 2 sees {1, 3} with equal frequency in sweep 1 -> takes 1
    val e = edges((1L, 2L), (2L, 3L))
    val r = LabelProp.run(e, "a", "b", rounds = 1).orderBy($"v")
      .as[(Long, Long)].collect().toSeq
    assert(r.find(_._1 == 2L).get._2 === 1L)
  }

  test("label propagation local sweeps equal the distributed rounds") {
    val li = graft.Tables.lineitem(spark, sf001)
      .filter($"l_orderkey" % 8 === 0)
    val e0 = CoOccur.pairs(li, "l_orderkey", "l_partkey")
    val two = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))
    for ((e, r) <- Seq((two, 1), (two, 3), (e0, 3))) {
      val local = LabelProp.run(e, "a", "b", r).orderBy($"v")
        .as[(Long, Long)].collect().toSeq
      val dirDf = {
        val c = e.select(least($"a", $"b").cast("long").as("x"),
          greatest($"a", $"b").cast("long").as("y"))
          .filter($"x" =!= $"y").distinct()
        c.select($"x".as("u"), $"y".as("v"))
          .unionAll(c.select($"y".as("u"), $"x".as("v")))
      }
      val dist = LabelProp.runDistributed(dirDf, r).orderBy($"v")
        .as[(Long, Long)].collect().toSeq
      assert(local === dist, s"local != distributed at rounds=$r")
    }
  }

  // ---- QuantileSketch ----

  test("quantile sketch merge law: partition sketches union losslessly") {
    // bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))
    val rows = (1 to 500).map(i => ("g", i.toLong * 7 % 1000, s"key-$i"))
    val df = rows.toDF("g", "v", "kid")
    val a = df.filter($"v" % 2 === 0)
    val b = df.filter($"v" % 2 =!= 0)
    val whole = QuantileSketch.bottomK(df, "g", "v", "kid", 32)
      .orderBy($"prio").as[(String, Long, Long, String)]
      .collect().toSeq
    val merged = QuantileSketch.bottomK(
        QuantileSketch.bottomK(a, "g", "v", "kid", 32)
          .unionAll(QuantileSketch.bottomK(b, "g", "v", "kid", 32))
          .withColumnRenamed("value", "v").withColumnRenamed("key", "kid")
          .select($"g", $"v", $"kid"),
        "g", "v", "kid", 32)
      .orderBy($"prio").as[(String, Long, Long, String)]
      .collect().toSeq
    assert(whole === merged)
  }

  test("bottomKPre over a precomputed priority equals bottomK's multiset") {
    // r14: q142 shares one hashed pass between sketch and exact twin —
    // the pre-hashed form must keep the (g, value, prio) multiset of
    // the key-hashing form (ties order by (prio, value) only, which is
    // multiset-invariant because tied rows carry equal value).
    val rows = (1 to 500).map(i => ("g" + i % 3, i.toLong * 7 % 100, s"key-$i"))
    val df = rows.toDF("g", "v", "kid")
    val viaKey = QuantileSketch.bottomK(df, "g", "v", "kid", 16)
      .select($"g", $"value", $"prio")
      .orderBy($"g", $"prio", $"value")
      .as[(String, Long, Long)].collect().toSeq
    val pre = df.withColumn("p", QuantileSketch.priority($"kid"))
    val viaPre = QuantileSketch.bottomKPre(pre, "g", "v", "p", 16)
      .orderBy($"g", $"prio", $"value")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaKey === viaPre)
  }

  test("quantile sketch estimates are the sample's order statistics") {
    // values 1..100 under one group with k >= n: estimates are exact
    val df = (1 to 100).map(i => ("g", i.toLong, s"u$i")).toDF("g", "v", "kid")
    val sk = QuantileSketch.bottomK(df, "g", "v", "kid", 200)
    val est = QuantileSketch.estimates(sk, "g",
        Seq("p50" -> 0.5, "p95" -> 0.95))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(est === Seq(("g", 100L, 50L, 95L)))
  }
}
