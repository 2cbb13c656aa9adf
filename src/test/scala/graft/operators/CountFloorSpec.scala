package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CountFloorSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch never under-estimates: every key with count >= floor survives") {
    // skewed stream: keys 0..99 once, 100..109 three times, 110 seven times
    val rows = (0L until 100L) ++
      (100L until 110L).flatMap(k => Seq(k, k, k)) ++ Seq.fill(7)(110L)
    val df = rows.toDF("k").repartition(8) // force multi-partition merge
    val bc = CountFloor.sketch(df, "k", expectedKeys = 128)
    for (floor <- Seq(1, 2, 3, 7)) {
      val trueCounts = rows.groupBy(identity).view.mapValues(_.size).toMap
      trueCounts.foreach { case (k, c) =>
        if (c >= floor)
          assert(bc.value.atLeast(k, floor),
            s"key $k count=$c must survive floor=$floor (no false negatives)")
      }
    }
    bc.destroy()
  }

  test("merge is lane-saturating and equals sequential adds") {
    val a = new SatCountSketch(1024, 7)
    val b = new SatCountSketch(1024, 7)
    val seqv = new SatCountSketch(1024, 7)
    val keys = (0L until 300L)
    keys.foreach { k => a.add(k); seqv.add(k) }
    keys.filter(_ % 3 == 0).foreach { k =>
      (1 to 9).foreach(_ => { b.add(k); seqv.add(k) }) // pushes past the cap
    }
    a.merge(b)
    keys.foreach { k =>
      for (floor <- 1 to 7)
        assert(a.atLeast(k, floor) == seqv.atLeast(k, floor),
          s"merged vs sequential diverge at key=$k floor=$floor")
    }
  }

  test("empty shells: unallocated sketches merge and probe correctly") {
    val a = new SatCountSketch(64, 3)
    val b = new SatCountSketch(64, 3)
    a.merge(b) // both null
    assert(!a.atLeast(5L, 1))
    b.add(5L)
    a.merge(b) // steals b's array (a was still unallocated)
    assert(a.atLeast(5L, 1))
    assert(!a.atLeast(5L, 2)) // single key, no colliders possible
  }

  test("sketch refuses an over-budget allocation loudly") {
    val df = Seq(1L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      CountFloor.sketch(df, "k", expectedKeys = 1L << 40, maxBytes = 1L << 20)
    }
    assert(e.getMessage.contains("maxBytes"))
  }

  test("q121 prekill law: floor-filtered pair aggregation is bit-identical (r12)") {
    // synthetic baskets over the fixture lineitem slice — the exact
    // q121 pipeline shape with the gate FORCED on (minPairs irrelevant:
    // we apply the prekill unconditionally here)
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val b = CoOccur.baskets(li, "l_orderkey", "l_partkey")
    val raw = CoOccur.packedPairsFromBaskets(b)
    def aggOf(pairs: org.apache.spark.sql.DataFrame) =
      pairs.groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
        .orderBy(col("pk"))
        .as[(Long, Long)].collect().toSeq
    val plain = aggOf(raw)
    val nPairs = math.max(1L, raw.count())
    val sk = CountFloor.sketch(raw, "pk", nPairs)
    val prekilled = aggOf(raw.filter(CountFloor.atLeast(sk, col("pk"), 3)))
    assert(prekilled === plain)
    // the basket-loop builder (q121's actual path) must behave
    // identically: same add-stream, and saturating counts are order-
    // and partitioning-independent, so the SURVIVOR SET matches the
    // explode-built sketch exactly
    val skB = CountFloor.sketchPackedPairs(b, "ps", nPairs)
    val prekilledB = aggOf(raw.filter(CountFloor.atLeast(skB, col("pk"), 3)))
    assert(prekilledB === plain)
    val survA = raw.filter(CountFloor.atLeast(sk, col("pk"), 3))
      .orderBy(col("pk")).as[Long].collect().toSeq
    val survB = raw.filter(CountFloor.atLeast(skB, col("pk"), 3))
      .orderBy(col("pk")).as[Long].collect().toSeq
    assert(survA === survB, "builders must produce identical sketches")
    sk.destroy(); skB.destroy()
  }

  test("sketchPackedPairs enforces the packed id-range contract") {
    val b = Seq((1L, Seq(5L, 2147483648L))).toDF("g", "ps")
    val e = intercept[Exception] {
      CountFloor.sketchPackedPairs(b, "ps", 4)
    }
    assert(e.getMessage != null)
  }

  test("singleton baskets with out-of-range ids match PackedPairs.pack: no throw (r13)") {
    // n=1 produces zero pairs in PackedPairs.pack, so the sketch builder
    // must not throw on the same input — the two paths the prekill gate
    // switches between have to accept identical inputs
    val b = Seq((1L, Seq(5000000000L)), (2L, Seq(3L, 7L))).toDF("g", "ps")
    val sk = CountFloor.sketchPackedPairs(b, "ps", 4)
    assert(sk.value.atLeast((3L << 32) + 7L, 1))
    sk.destroy()
  }

  test("atLeast refuses floor above the sketch cap loudly (r13)") {
    val s = new SatCountSketch(64, 3)
    s.add(1L)
    val e = intercept[IllegalArgumentException] { s.atLeast(1L, 4) }
    assert(e.getMessage.contains("cap"))
    val df = Seq(1L).toDF("k")
    val bc = CountFloor.sketch(df, "k", expectedKeys = 16, cap = 3)
    val e2 = intercept[IllegalArgumentException] {
      CountFloor.atLeast(bc, col("k"), 5)
    }
    assert(e2.getMessage.contains("cap"))
    bc.destroy()
  }

  test("maxKeysFor caps at the byte budget and the capped sketch builds (r13)") {
    val cap = CountFloor.maxKeysFor(loadFactor = 0.5, maxBytes = 1L << 20)
    // cells = 2^21, keys = 2^20 at lf 0.5
    assert(cap == (1L << 20))
    val df = Seq(1L, 1L, 2L).toDF("k")
    // an over-budget stream, capped at the call site, must build fine
    val bc = CountFloor.sketch(df, "k",
      expectedKeys = math.min(1L << 40, cap), maxBytes = 1L << 20)
    assert(bc.value.atLeast(1L, 2))
    bc.destroy()
  }
}
