package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

object SketchFilterSpec {
  val buildTouches = new java.util.concurrent.atomic.AtomicInteger()
}

class SketchFilterSpec extends SparkTestBase {

  test("bloomSemi is lazy: no job runs at construction (r4 advisory)") {
    val s = spark
    import s.implicits._
    SketchFilterSpec.buildTouches.set(0)
    val touch = udf { (x: Long) => SketchFilterSpec.buildTouches.incrementAndGet(); x }
    // spark.range, not a local Seq: the optimizer eagerly evaluates
    // projections over LocalRelation, which would count as touches
    val right = spark.range(3, 7, 2).select(touch(col("id")).as("rk"))
    val left = spark.range(1, 20).select(col("id").as("k"))
    val joined = SketchFilter.bloomSemi(left, "k", right, "rk", 10L)
    joined.queryExecution.executedPlan // plan-only inspection
    assert(SketchFilterSpec.buildTouches.get() == 0,
      "sketch build must not execute at construction/planning time")
    assert(joined.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L))
    assert(SketchFilterSpec.buildTouches.get() > 0)
  }

  test("bloomSemi is bit-identical to a plain left-semi join") {
    val s = spark
    import s.implicits._
    val left = (1L to 5000L).map(i => (i, i * 7919L % 1000L)).toDF("id", "k")
    val right = (0L to 999L by 3L).toDF("rk")
    val exact = left.join(right, col("k") === col("rk"), "leftsemi")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val bloom = SketchFilter.bloomSemi(left, "k", right, "rk", expectedItems = 1000L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("empty build side yields an empty semi join") {
    val s = spark
    import s.implicits._
    val left = Seq(1L, 2L).toDF("k")
    val right = Seq.empty[Long].toDF("rk")
    assert(SketchFilter.bloomSemi(left, "k", right, "rk", 10L).count() == 0)
  }

  test("bloomSemiAuto gates on the probe estimate: plain when small, sketch when forced") {
    val s = spark
    import s.implicits._
    val left = spark.range(1, 101).select(col("id").as("k"))
    val right = Seq(3L, 5L, 97L).toDF("rk")
    // small probe: below the default threshold → NO sketch build, plain
    // semi join plan
    val gated = SketchFilter.bloomSemiAuto(left, "k", right, "rk", 10L)
    assert(!gated.queryExecution.executedPlan.toString.contains("might_contain"))
    // forced on (threshold 0): sketch path, identical answer
    val forced = SketchFilter.bloomSemiAuto(left, "k", right, "rk", 10L,
      minProbeBytes = 0L)
    assert(forced.queryExecution.executedPlan.toString.contains("might_contain"))
    assert(forced.collect().map(_.getLong(0)).sorted.toSeq ==
      gated.collect().map(_.getLong(0)).sorted.toSeq)
    assert(gated.count() == 3)
  }

  test("bloomSemi refuses a plan-literal sketch above maxSketchBytes, loudly") {
    val s = spark
    import s.implicits._
    val left = Seq(1L).toDF("k")
    val right = Seq(1L).toDF("rk")
    val e = intercept[IllegalArgumentException] {
      // 10^10 keys at 1% fpp ≈ 12 GB of bitset — the regime the literal
      // form must refuse (construction-time check; no data is touched)
      SketchFilter.bloomSemi(left, "k", right, "rk", expectedItems = 10000000000L)
    }
    assert(e.getMessage.contains("bloomSemiBroadcast"), e.getMessage)
    assert(e.getMessage.contains("PLAN LITERAL"), e.getMessage)
  }

  test("bloomSemiBroadcast is bit-identical to the plain semi and probes via codegen") {
    val s = spark
    import s.implicits._
    // spark.range left: filters over a LocalRelation are eagerly folded
    // by the optimizer, which would erase the predicate under test
    val left = spark.range(1, 5001)
      .select(col("id"), (col("id") * 7919L % 1000L).as("k"))
    val right = (0L to 999L by 3L).toDF("rk")
    val exact = left.join(right, col("k") === col("rk"), "leftsemi")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val bc = SketchFilter.bloomSemiBroadcast(left, "k", right, "rk", expectedItems = 1000L)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_bc"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"), plan)
    assert(bc.select("id").collect().map(_.getLong(0)).sorted.toSeq == exact)
    assert(exact.nonEmpty)
  }

  test("bloomSemiAuto routes oversized sketches to the broadcast form") {
    val s = spark
    import s.implicits._
    val left = spark.range(1, 101).select(col("id").as("k"))
    val right = Seq(3L, 5L, 97L).toDF("rk")
    // force the sketch path (minProbeBytes=0) with a tiny maxSketchBytes:
    // without the explicit opt-in the gate must FAIL FAST (r7 advisory:
    // the broadcast branch runs an eager build-side job), with it the
    // gate picks the broadcast predicate
    val refused = intercept[IllegalArgumentException] {
      SketchFilter.bloomSemiAuto(left, "k", right, "rk", 10000L,
        minProbeBytes = 0L, maxSketchBytes = 1024L)
    }
    assert(refused.getMessage.contains("autoBroadcast"), refused.getMessage)
    val auto = SketchFilter.bloomSemiAuto(left, "k", right, "rk", 10000L,
      minProbeBytes = 0L, maxSketchBytes = 1024L, autoBroadcast = true)
    val p = auto.queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain_bc"), p)
    assert(auto.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L, 97L))
  }

  test("bloomSemiBroadcastWithHandle: explicit destroy after the last run") {
    val s = spark
    import s.implicits._
    val left = spark.range(1, 50).select(col("id").as("k"))
    val right = Seq(7L, 11L).toDF("rk")
    val (df, handle) = SketchFilter.bloomSemiBroadcastWithHandle(
      left, "k", right, "rk", 100L)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 11L))
    handle.destroy() // deterministic cleanup of the sketch blocks
  }

  test("bloomSemiBroadcast refuses non-integral keys (lossy cast would drop matches)") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 1L)).toDF("k", "x")
    val right = Seq("a").toDF("rk")
    val e = intercept[IllegalArgumentException] {
      SketchFilter.bloomSemiBroadcast(left, "k", right, "rk", 10L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // int keys are fine (sketched via putLong, probed via mightContainLong)
    val li = spark.range(1, 100).select(col("id").cast("int").as("k"))
    val ri = Seq(3, 5).toDF("rk").select(col("rk").cast("int").as("rk"))
    assert(SketchFilter.bloomSemiBroadcast(li, "k", ri, "rk", 10L).count() == 2)
  }

  test("the prefilter predicate is the codegen might_contain, not a UDF") {
    val s = spark
    import s.implicits._
    // spark.range, not a LocalRelation: the optimizer eagerly evaluates
    // filters over local tables, which would erase the predicate
    val left = spark.range(1, 101).select(col("id").as("k"))
    val right = Seq(3L, 5L).toDF("rk")
    val plan = SketchFilter.bloomSemi(left, "k", right, "rk", 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"), plan)
  }

  test("decontaminateStream flags contaminated docs over a true stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    val evalSet = Seq(
      (1L, "the held out benchmark question about spark joins"),
      (2L, "another sacred eval sentence nobody may train on"))
      .toDF("doc_id", "text")
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val (flagged, handle) = SketchFilter.decontaminateStream(
      in.toDF().toDF("doc_id", "text"), "text", evalSet, "text", 5, 1000L)
    val q = flagged.writeStream.format("memory").queryName("decon_ingest")
      .outputMode("append").start()
    try {
      in.addData(
        // contains a full 5-token eval span -> must flag
        (10L, "prefix words then the held out benchmark question about spark"),
        // clean doc -> must pass
        (11L, "totally unrelated training text with fresh original content"),
        // contaminated by the second eval doc
        (12L, "copy of another sacred eval sentence nobody may train on today"))
      q.processAllAvailable()
      val got = s.sql("SELECT doc_id, contaminated FROM decon_ingest")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got === Map(10L -> true, 11L -> false, 12L -> true))
    } finally {
      q.stop()
      handle.destroy()
    }
  }
}
