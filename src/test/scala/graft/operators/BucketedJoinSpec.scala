package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bucketed (q144): the exchange-free-join pin. With broadcast disabled
  * (so the planner can't sidestep the shuffle question), the join of
  * two co-bucketed tables must contain ZERO Exchange operators — the
  * bucket layout IS the required distribution — and the answer must be
  * bucketing-invariant. */
class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally prev.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(v =>
      conf.set("spark.sql.autoBroadcastJoinThreshold", v))
  }

  test("co-bucketed join plans with zero Exchange and matches the plain join") {
    withNoBroadcast {
      val facts = (1L to 2000L).map(i => (i % 100, i)).toDF("k", "x")
      val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("dk", "name")
      val bf = Bucketed.materializeOnce(facts, "graft_bkt_spec_facts", "k", 8)
      val bd = Bucketed.materializeOnce(dim, "graft_bkt_spec_dim", "dk", 8)
      val joined = Bucketed.join(bf, bd, "k", "dk")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // answer == the plain (shuffling) join's answer
      val got = joined.groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k").as[(Long, Long)].collect().toSeq
      val want = facts.join(dim, $"k" === $"dk")
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k").as[(Long, Long)].collect().toSeq
      assert(got === want)
    }
  }

  test("materializeOnce is session-idempotent (no re-write on reuse)") {
    val df = (1L to 10L).map(i => (i, i * 2)).toDF("k", "v")
    val t1 = Bucketed.materializeOnce(df, "graft_bkt_spec_once", "k", 4)
    val n1 = t1.count()
    // second call with DIFFERENT data must serve the catalog table
    val other = (1L to 99L).map(i => (i, i)).toDF("k", "v")
    val t2 = Bucketed.materializeOnce(other, "graft_bkt_spec_once", "k", 4)
    assert(t2.count() === n1)
  }

  test("stale-generation GC is scoped to the source path (r13 ADVICE)") {
    // two "SFs" of the same family = same family prefix, DIFFERENT path
    // hash; a stale generation = same (family, path hash), different
    // content hash. Landing a fresh generation must collect ONLY the
    // stale sibling, never the other SF's table.
    val df = (1L to 10L).map(i => (i, i)).toDF("k", "v")
    val pathA = "deadbeef01"
    val pathB = "deadbeef02"
    val otherSf = Bucketed.materializeOnce(df,
      s"graft_bkt_gcspec_${pathB}_cccc0001", "k", 2)
    Bucketed.materializeOnce(df, s"graft_bkt_gcspec_${pathA}_aaaa0001", "k", 2)
    // fresh content generation for path A: collects aaaa0001 only
    Bucketed.materializeOnce(df, s"graft_bkt_gcspec_${pathA}_aaaa0002", "k", 2)
    assert(!spark.catalog.tableExists(s"graft_bkt_gcspec_${pathA}_aaaa0001"),
      "stale generation of the SAME source must be collected")
    assert(spark.catalog.tableExists(s"graft_bkt_gcspec_${pathB}_cccc0001"),
      "a different source path's table must survive the GC")
    assert(otherSf.count() === 10L, "the surviving table must still read")
    // single-hex-suffix names are out of GC scope entirely
    Bucketed.materializeOnce(df, "graft_bkt_gcspec2_aaaa0001", "k", 2)
    Bucketed.materializeOnce(df, "graft_bkt_gcspec2_aaaa0002", "k", 2)
    assert(spark.catalog.tableExists("graft_bkt_gcspec2_aaaa0001"),
      "single-hex-suffix names must never be collected")
  }

  test("contentSuffix carries the path segment and tracks content (r13)") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_cs_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_cs_b").toString
    val sA = Bucketed.contentSuffix(spark, dirA)
    val sB = Bucketed.contentSuffix(spark, dirB)
    assert(sA.startsWith(Bucketed.suffixFor(dirA) + "_"))
    assert(sA.split("_").head != sB.split("_").head,
      "different dirs must have different path segments")
    // content change flips only the content segment
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dirA, "f.bin"), Array[Byte](1, 2, 3))
    val sA2 = Bucketed.contentSuffix(spark, dirA)
    assert(sA2.split("_").head === sA.split("_").head)
    assert(sA2 != sA)
  }
}
