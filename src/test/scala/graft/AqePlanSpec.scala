package graft

/** The PlanSpec pins re-run under the configuration a production
  * cluster would actually use: AQE ON and cluster-width shuffle
  * partitions (r8 verdict item 3). The bench session runs AQE off with
  * 4-wide exchanges because at sf0.1 every stage is statically
  * known-small and AQE's materialize-and-replan round-trips are pure
  * latency (BASELINE.md r2 config sweep) — but that inverts at real
  * scale, so the scale-critical plan shapes (pushdown, broadcast,
  * band-equality candidates, delta pruning, no cartesian) must be
  * proven to survive the AQE planner too. AdaptiveSparkPlanExec prints
  * its whole initial plan via toString, so the same string pins apply;
  * shape properties AQE may legitimately rewrite at runtime (e.g.
  * shuffle→broadcast promotion) are pinned from the initial plan only.
  */
class AqePlanSpec extends SparkTestBase {

  /** Run `body` with AQE enabled and 200 shuffle partitions (the
    * classic cluster default), restoring the suite session's confs
    * after — the session is shared across suites via getOrCreate. */
  private def withAqe[A](body: => A): A = {
    val conf = spark.conf
    val prevAqe = conf.getOption("spark.sql.adaptive.enabled")
    val prevParts = conf.getOption("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.shuffle.partitions", "200")
    try body
    finally {
      prevAqe.fold(conf.unset("spark.sql.adaptive.enabled"))(v =>
        conf.set("spark.sql.adaptive.enabled", v))
      prevParts.fold(conf.unset("spark.sql.shuffle.partitions"))(v =>
        conf.set("spark.sql.shuffle.partitions", v))
    }
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("AQE: planner is actually adaptive under the override") {
    withAqe {
      assert(plan("q03_join_inner").contains("AdaptiveSparkPlan"))
    }
  }

  test("AQE: q02 filter+projection still push into the parquet scan") {
    withAqe {
      val p = plan("q02_filter_project")
      assert(p.contains("PushedFilters: ["), p)
      assert(p.contains("GreaterThan(l_quantity"), p)
      assert(p.contains(
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
    }
  }

  test("AQE: q04 small-dim join still broadcasts") {
    withAqe {
      val p = plan("q04_join_broadcast")
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }

  test("AQE: q32 Jaccard candidates stay equality-join, window-free") {
    withAqe {
      val p = plan("q32_dedup_ngram_jaccard")
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("Window"), p)
      // the h-partitioned shingle profile is still materialized once
      assert(p.contains("Scan ExistingRDD"), p)
    }
  }

  test("AQE: q76 cost gate still picks the plain semi join below threshold") {
    withAqe {
      val p = plan("q76_decontamination_bloom")
      assert(!p.contains("might_contain"), p)
      assert(p.contains("LeftSemi"), p)
    }
  }

  test("AQE: q88 compacted-state read still prunes the lake scan to the delta") {
    withAqe {
      val p = plan("q88_cdc_compacted_state")
      assert(p.contains("= corpus") && p.contains("= docs"), p)
      assert("binlog_position#\\d+L? > \\d+".r.findFirstIn(p).nonEmpty, p)
      assert(p.contains("PushedFilters: [Or(GreaterThan(binlog_file"), p)
      assert(p.contains("WindowGroupLimit"), p)
    }
  }

  test("AQE: q91 substring removal keeps its single-Generate, no-window shape") {
    withAqe {
      val p = plan("q91_substring_removal")
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("Window"), p)
      assert(p.contains("Scan ExistingRDD"), p)
      val nGenerate = "(?m)^\\s*(?:[+:]-\\s*)?Generate ".r.findAllIn(p).size
      assert(nGenerate == 1, s"expected 1 Generate node, got $nGenerate:\n$p")
    }
  }

  test("AQE: q33 LSH candidates still avoid any cross product") {
    withAqe {
      val p = plan("q33_dedup_minhash_lsh")
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("Scan ExistingRDD"), p)
    }
  }

  test("AQE: q101 profile-store probe candidates stay band-equality joins") {
    withAqe {
      val p = plan("q101_neardup_profile_store")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("AQE: q105 per-group reservoir keeps its WindowGroupLimit") {
    withAqe {
      val p = plan("q105_reservoir_per_group")
      assert(p.contains("WindowGroupLimit"), p)
    }
  }

  test("AQE: analytics joins still avoid cartesian products at cluster width") {
    withAqe {
      for (q <- Seq("q115_triangles", "q118_pagerank", "q121_basket_lift",
          "q122_max_concurrency")) {
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      }
    }
  }

  test("AQE: q126 keeps WindowGroupLimit; q112 sketch probe still broadcasts") {
    withAqe {
      assert(plan("q126_kmv_per_group").contains("WindowGroupLimit"))
      assert(plan("q112_countmin_heavy").contains("BroadcastHashJoin"))
    }
  }

  test("AQE: q142 sketch keeps its map-side WindowGroupLimit; r10 queries stay cartesian-free") {
    withAqe {
      assert(plan("q142_quantile_sketch").contains("WindowGroupLimit"))
      for (q <- Seq("q137_line_dedup", "q138_snapshot_diff",
          "q143_kl_mixture", "q147_power_iteration", "q149_diff_apply")) {
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      }
    }
  }

  test("AQE: q144 bucketed join still plans exchange-free between the scans") {
    withAqe {
      // the join itself must not shuffle either bucketed side; the
      // downstream aggregation's exchange is expected — so pin the
      // SMJ/scan region only (no Exchange between the two bucketed
      // FileScans and their SortMergeJoin)
      val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val sfx = graft.operators.Bucketed.suffixFor(sf001)
        val o = graft.operators.Bucketed.materializeOnce(
          graft.Tables.orders(spark, sf001).select(
            org.apache.spark.sql.functions.col("o_custkey")),
          s"graft_bkt_aqe_o_$sfx", "o_custkey", 8)
        val c = graft.operators.Bucketed.materializeOnce(
          graft.Tables.customer(spark, sf001).select(
            org.apache.spark.sql.functions.col("c_custkey")),
          s"graft_bkt_aqe_c_$sfx", "c_custkey", 8)
        val p = graft.operators.Bucketed.join(o, c, "o_custkey", "c_custkey")
          .queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"), p)
      } finally prev.fold(
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(v =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
  }

  test("AQE: answers are identical to the bench-config plans (q32/q76/q91)") {
    // shape pins above; this pins VALUES — the adaptive planner must not
    // change any result. Compared via the canonical render sort.
    import org.apache.spark.sql.graftbridge.Bridge
    for (q <- Seq("q32_dedup_ngram_jaccard", "q76_decontamination_bloom",
        "q91_substring_removal")) {
      val base = Bridge.renderSort(SparkEntry.queries(q)(spark, sf001))
        .collect().map(_.toString).toSeq
      val aqe = withAqe {
        Bridge.renderSort(SparkEntry.queries(q)(spark, sf001))
          .collect().map(_.toString).toSeq
      }
      assert(aqe == base, s"$q: AQE run diverged from bench-config run")
    }
  }
}
