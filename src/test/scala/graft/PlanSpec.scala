package graft

/** Physical-plan shape assertions for the headline queries — the
  * properties that make these plans scale (SURVEY.md §4): filters reach
  * the parquet scan, projections prune the read schema, small dims
  * broadcast instead of shuffling, top-k avoids a global sort, and
  * aggregations run partial+final. A regression in any of these would
  * still pass the value-level oracle at test scale while quietly
  * becoming a bottleneck at 100 TB, so they are pinned here.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  test("q02 filter+projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // read schema pruned to the 3 referenced columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("q04 small-dim join broadcasts (no shuffle join)") {
    val p = plan("q04_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q06 anti join on a key-only projection") {
    val p = plan("q06_join_anti")
    assert(p.contains("LeftAnti"), p)
    // lineitem side read prunes to the join key only
    assert(p.contains("ReadSchema: struct<l_partkey:bigint>"), p)
  }

  test("q11 aggregation is partial+final with pushed date filter") {
    val p = plan("q11_agg_pricing_summary")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q15 top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q30 similarity is a broadcast single-pass with native kernels") {
    val p = plan("q30_similarity_topk")
    // native codegen expression in the projection — not a UDF invocation
    assert(p.contains("vector_dot"), p)
    assert(!p.contains("UDF"), p)
    // the query vector is broadcast — the base side must not shuffle
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,1000)"), p)
    // top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q33 LSH candidates come from an equality join, not a cross product") {
    val p = plan("q33_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    // the per-doc profile (minhash minima + shingle set) is materialized
    // ONCE by the eager localCheckpoint and read back as an RDD scan by
    // all three consumers — band self-join plus both verification sides.
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("dedup path has no partition-less window (the 100 TB scale-killer)") {
    // Token/shingle identity is a direct polynomial string hash — there
    // is no global vocabulary, so no Window.orderBy-without-partitionBy
    // (= all rows to ONE task) may appear anywhere in the dedup plans.
    for (q <- Seq("q32_dedup_ngram_jaccard", "q33_dedup_minhash_lsh",
        "q34_dedup_simhash", "q56_dedup_components")) {
      val hasWindow = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.exists(_.nodeName.contains("Window"))
      assert(!hasWindow, s"$q: dedup plan must contain no WindowExec at all")
    }
  }

  test("q91 substring removal shuffles occurrences, never exploded tokens") {
    // The rewrite's scale contract: span occurrences (16-byte rows) are
    // the only exploded stream, materialized ONCE by the eager
    // h-partitioned localCheckpoint (Scan ExistingRDD serves both the
    // canonical-min aggregation and the join back — one corpus pass of
    // the span kernel), and the final text rebuild is an in-row HOF
    // over the original row's token array — so exactly ONE Generate
    // (explode of the dropped-index sequences) may remain and no
    // token-level explode. Canonical-occurrence selection is a min
    // aggregation, not a window; no candidate generation goes
    // quadratic. (plan-string based: AQE's root hides its subtree from
    // collect/exists, but toString prints the whole initial plan)
    val p = plan("q91_substring_removal")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    val nGenerate = "(?m)^\\s*(?:[+:]-\\s*)?Generate ".r.findAllIn(p).size
    assert(nGenerate == 1, s"expected 1 Generate node, got $nGenerate:\n$p")
  }

  test("q95 BPE encode is one narrow map: no exchange except the render sort") {
    // the production APPLY step's scale contract: after training, the
    // encode touches the corpus once with zero wide operations — the
    // only Exchange in the plan is the final presentation orderBy
    // Tables.spread's round-robin repartition (single-file parallelism
    // at fixture scale) is deliberate and allowed; what may NOT appear
    // is any hash exchange — the encode itself never shuffles by key
    val p = plan("q95_bpe_encode")
    assert(!p.contains("Exchange hashpartitioning"), p)
    val nRange = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(nRange == 1, s"expected exactly the orderBy range exchange:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q92 z-order aggregation runs partial+final over codegen bit ops") {
    val p = plan("q92_zorder_layout")
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    // the interleave is plain bit algebra, no UDF invocation
    assert(!p.contains("UDF"), p)
    assert(!p.contains("Window"), p)
  }

  test("q73 batch-probe ANN is a bucket-equality join, never a per-probe sweep") {
    val p = plan("q73_ann_batch_probe")
    // candidates must come from equality on the bucket id: no
    // BroadcastNestedLoopJoin or CartesianProduct over the corpus (the
    // per-probe scan shape q59 uses for its single probe)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the rerank window is probe-partitioned, not global
    assert(p.contains("Window"), p)
  }

  test("q76 cost gate picks the plain semi join below the probe threshold") {
    // at fixture scale the probe side is tiny, so bloomSemiAuto must NOT
    // pay the sketch-build pass — the plan is the plain exact semi join.
    // The forced-on path's might_contain pin lives in SketchFilterSpec.
    val p = plan("q76_decontamination_bloom")
    assert(!p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q76 gate picks the plain semi at BENCH scale too (sf0.1)") {
    // the r5 verdict asked for proof at the scale the bench runs: the
    // probe estimate for sf0.1's eval spans still sits under 256 MB, so
    // q76 must run q70's exact plan there (their idle times then match
    // by construction). Skip silently if the driver testdata is absent.
    val dir = "/root/testdata/sf0.1"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    val p = SparkEntry.queries("q76_decontamination_bloom")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q75 containment keeps q33's candidate shape (r6 recovery pin)") {
    // The r5->r6 q75 swing (5.68x -> 1.61x with no containmentPairs
    // change) was never pinned; this freezes the plan properties that
    // keep it fast so a silent regression cannot hide behind suite
    // order: LSH band-EQUALITY candidates (no cross product), the
    // per-doc profile materialized ONCE via the eager localCheckpoint
    // (read back as ExistingRDD by the band join and both verify
    // sides), and no window anywhere (SuiteOrderProbe is the matching
    // measurement harness; findings in BASELINE.md).
    val plan = SparkEntry.queries("q75_dedup_containment")(spark, sf001)
      .queryExecution.executedPlan
    val p = plan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!plan.exists(_.nodeName.contains("Window")), p)
  }

  test("q87 landed-lake read prunes partitions and group-limits before the window") {
    // The composition query's 100 TB properties: the (database, table)
    // filter reaches the lake scan as PARTITION pruning (a multi-table
    // lake reads exactly one table's files), the read schema prunes to
    // the 3 referenced columns, and the rn=1 state merge runs as
    // WindowGroupLimit — partial top-1 per pk BEFORE the window
    // exchange, so the shuffle carries ~one row per key per map task.
    val p = plan("q87_cdc_landed_quality")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("= corpus") && p.contains("= docs"), p)
    // pruning pin: the 3 referenced columns are read, the unreferenced
    // lake columns are not (presence-based, not the exact struct string —
    // column order/rendering is incidental across Spark versions)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
      .getOrElse(fail(s"no ReadSchema in plan:\n$p"))
    for (c <- Seq("operation:", "binlog_position:", "rows_json:"))
      assert(read.contains(c), s"$c missing from ReadSchema <$read>")
    for (c <- Seq("binlog_file", "row_idx"))
      assert(!read.contains(c), s"$c not pruned from ReadSchema <$read>")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q88 compacted-state read prunes the lake scan to the delta") {
    // The compaction contract at scale: the post-snapshot read must not
    // re-scan the covered history — the (database, table) filter prunes
    // lake partitions and the high-water range predicate pushes into
    // the delta's parquet scan (row-group stats then skip
    // fully-compacted files); the merge still group-limits before the
    // window exchange like q87.
    val p = plan("q88_cdc_compacted_state")
    assert(p.contains("= corpus") && p.contains("= docs"), p)
    // the high-water range predicate sits on the lake scan and pushes
    // down (the PushedFilters rendering truncates at 100 chars, so pin
    // the Filter node and the pushed prefix separately)
    assert("binlog_position#\\d+L? > \\d+".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("PushedFilters: [Or(GreaterThan(binlog_file"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q77 bucketed near-dup candidates come from an equality join") {
    val p = plan("q77_neardup_bucketed")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q82 semantic-dedup pair candidates come from a cluster-equality join") {
    // the only loop join is the broadcast centroid expansion; the pair
    // stage must co-shuffle on the assigned cluster id, never cross the
    // corpus with itself
    val p = plan("q82_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q83 profile gate picks pruned per-column scans at fixture scale") {
    // small side of the Profiling cost gate: no Expand row
    // multiplication, one single-column pruned scan per profiled column;
    // the forced one-pass (Expand + single scan) pin lives in
    // ProfilingSpec next to the gate test
    val p = plan("q83_column_profile")
    assert(!p.contains("Expand"), p)
    assert("FileScan parquet".r.findAllMatchIn(p).length == 4, p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"), p)
  }

  test("q67 k-means assignment aggregates, never window-sorts the expansion") {
    val plan = SparkEntry.queries("q67_kmeans_step")(spark, sf001)
      .queryExecution.executedPlan
    assert(!plan.exists(_.nodeName.contains("Window")),
      "assignment must be a max_by aggregate, not a row_number window")
    assert(!plan.toString.contains("CartesianProduct"))
  }

  test("q71 quality filter is one narrow pass: no join, window, or explode") {
    val plan = SparkEntry.queries("q71_quality_filter")(spark, sf001)
      .queryExecution.executedPlan
    for (bad <- Seq("Join", "Window", "Generate"))
      assert(!plan.exists(_.nodeName.contains(bad)),
        s"q71 must contain no $bad node")
  }

  test("renderSort: root sort loses RangePartitioning, limit keeps TakeOrdered") {
    import org.apache.spark.sql.graftbridge.Bridge
    // A result-rendering sort becomes shuffle-to-1 + local sort (no
    // range-partitioning sample pass) and the row sequence is unchanged.
    val sorted = SparkEntry.queries("q12_count_distinct")(spark, sf001)
    val rendered = Bridge.renderSort(sorted)
    val p = rendered.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"), p)
    assert(p.contains("SinglePartition") || p.contains("Sort"), p)
    assert(rendered.collect().toSeq == sorted.collect().toSeq)
    // A sort feeding a LIMIT is not rewritten — still TakeOrderedAndProject.
    val topk = Bridge.renderSort(SparkEntry.queries("q15_topk")(spark, sf001))
    assert(topk.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("spread decides from plan metadata, not a materialized RDD (r7 advisory)") {
    import org.apache.spark.sql.graftbridge.Bridge
    // single-file fixture scan: estimator resolves (file-scan leaf) and
    // spread widens it to defaultParallelism
    val docs = Tables.documents(spark, sf001)
    assert(Bridge.sourcePartitionEstimate(docs).nonEmpty)
    assert(Tables.spread(docs).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // filter/project on top of the scan still resolves (the call-site shape)
    import org.apache.spark.sql.functions.col
    assert(Bridge.sourcePartitionEstimate(
      docs.filter(col("doc_id") < 100).select("doc_id", "text")).nonEmpty)
    // already-wide materialized input (LogicalRDD leaf): exact count, no-op
    val wide = docs.repartition(8).localCheckpoint(true)
    assert(Bridge.sourcePartitionEstimate(wide).contains(8L))
    assert(Tables.spread(wide) eq wide)
    // a shuffle between leaf and root is NOT claimed by the estimator
    assert(Bridge.sourcePartitionEstimate(docs.repartition(8)).isEmpty)
  }

  test("analytics windows are all entity-partitioned (no single-task sort)") {
    // q117 lead(), q119 sessionization, q120 rolling moments, q122
    // slice-local running sums: every WindowExec must carry a partition
    // spec — a partition-less window funnels the stream into ONE task.
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q117_event_transitions", "q119_session_paths",
        "q120_rate_anomaly", "q122_max_concurrency")) {
      val bad = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
      assert(bad.isEmpty, s"$q: partition-less WindowExec in plan")
    }
  }

  test("analytics joins produce no cartesian product") {
    // blocked fuzzy pairs, funnel stage chains, co-occurrence graphs,
    // basket lift: candidates must come from equality joins (the 1-row
    // aggregate combiners plan as broadcast nested-loop, not
    // CartesianProduct).
    for (q <- Seq("q113_fuzzy_match", "q114_funnel", "q115_triangles",
        "q116_retention_cohorts", "q118_pagerank", "q121_basket_lift",
        "q122_max_concurrency")) {
      val p = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q112 sketch probe is a broadcast join over a partial+final build") {
    val p = plan("q112_countmin_heavy")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q113 fuzzy pairs come from a broadcast block join, DP as a built-in") {
    // the deduplicated value table is an eager checkpoint (Scan
    // ExistingRDD hides the pruned parquet scan, the q33/q91 pattern);
    // the within-block pair join must broadcast the block key side and
    // the Levenshtein DP must be the codegen built-in, not a UDF
    val p = plan("q113_fuzzy_match")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("levenshtein"), p)
    assert(!p.contains("UDF"), p)
  }

  test("q121 item-frequency dims broadcast into the pair stream") {
    val p = plan("q121_basket_lift")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q126 per-group k-minima plan as WindowGroupLimit (map-side top-k)") {
    val p = plan("q126_kmv_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q134 point-in-time lookup is joinless windows over one entity exchange") {
    // r14: facts and dimension derive from the same orders rows, so the
    // PIT interval join is a window identity (Scd2.asOfSameSource) —
    // the plan must contain NO join at all (the pre-r14 guard was
    // "equi-join, never BroadcastNestedLoop/cartesian over facts ×
    // versions"; joinless is strictly stronger) and exactly one
    // hash-partitioning exchange on the entity key feeding the windows
    // (the second exchange is the render sort's range partitioning).
    val p = plan("q134_scd2_pit")
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    // exactly one: a second entity exchange is the very regression the
    // r14 rewrite removed (ADVICE r14 — `>= 1` would not catch it)
    assert("hashpartitioning\\(o_custkey".r.findAllIn(p).size == 1, p)
  }

  test("bucketed tables join without a shuffle (co-located join at scale)") {
    // The 100 TB join strategy: both sides bucketed on the join key at
    // write time -> SortMergeJoin reads buckets directly, zero Exchange.
    val s = spark
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(s, sf001).write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(s, sf001).write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val j = s.table("b_orders").join(s.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount"), p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
