package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{GraphDedup, TextDedup}

/** Scale-linearity probe for the flagship dedup operators: runs the
  * MinHash-LSH near-dup pipeline, the span-dedup pipeline, and SimHash
  * over synthetically scaled copies of the sf0.1 corpus and reports
  * wall-clock per scale factor. Copies are alphabet-ROTATED (each copy's
  * tokens live in a disjoint hash space), so the near-dup pair structure
  * stays per-copy and measured growth isolates the ENGINE's scaling —
  * a superlinear curve here would expose a hidden global structure or
  * all-pairs stage; linear growth is the 100 TB evidence.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [factors csv]
  * Prints one JSON line per (op, factor).
  */
object ScaleProbe {

  private def rotAlphabet(k: Int): String =
    ('a' to 'z').map(c => (((c - 'a') + k) % 26 + 'a').toChar).mkString

  /** `factor` disjoint-token copies of the corpus (doc_id offset per copy). */
  private def scaled(docs: DataFrame, factor: Int): DataFrame = {
    val n = 1000000L
    (0 until factor).map { k =>
      // lower() first: tokenizers lowercase downstream, so rotating the
      // raw text would leave uppercase letters unrotated and couple the
      // copies' token spaces
      docs.select((col("doc_id") + lit(k * n)).as("doc_id"),
        translate(lower(col("text")), rotAlphabet(0), rotAlphabet(k)).as("text"))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,4,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "minhash_lsh_neardup" -> (d => TextDedup.nearDupPairs(d, 3000L).count()),
      "span_dedup" -> { d =>
        val spans = TextDedup.spanHashes(d, 5)
        spans.groupBy(col("h")).agg(count(lit(1)).as("nd"))
          .filter(col("nd") >= 2).count()
      },
      "simhash" -> { d =>
        // the REAL q34 shape: h62 expansion + 62 per-bit vote sums +
        // fingerprint fold (not just the token-hash groupBy)
        val th = d.select(col("doc_id"),
            explode(array_distinct(TextDedup.tokenHashes(col("text")))).as("hv"))
          .select(col("doc_id"),
            (((col("hv") * 48271L) % 2147483647L) * 2147483648L +
              ((col("hv") * 69621L) % 2147483647L)).as("h62"))
        val bitSums = (0 until 62).map(b =>
          sum(when(expr(s"(shiftright(h62, $b) & 1) = 1"), 1L).otherwise(-1L)).as(s"s$b"))
        val votes = th.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        val fingerprint = (0 until 62).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
        votes.select(col("doc_id"), fingerprint.cast("long").as("simhash")).count()
      },
      "dedup_components" -> { d =>
        GraphDedup.connectedComponentsStar(
          TextDedup.nearDupPairs(d, 3000L), "d1", "d2").count()
      },
      "substring_removal" -> { d =>
        // q91's destructive rewrite. The checksum aggregate forces the
        // clean_text rebuild (a bare count() would let Catalyst prune
        // the rewrite HOF out of the plan entirely).
        TextDedup.removeDuplicateSpans(d, 5)
          .agg(sum(length(col("clean_text")) + col("n_kept")))
          .head().getLong(0)
      })

    // Dev loop: optional 3rd arg restricts to a csv of op names.
    val onlyOps = args.lift(2).map(_.split(",").map(_.trim).toSet)
    def wanted(name: String): Boolean = onlyOps.forall(_.contains(name))

    for ((name, op) <- ops if wanted(name); f <- factors) {
      val d = scaled(base, f)
      op(d) // warm (codegen + scan)
      val (sec, rows) = time(op(d))
      println(s"""{"op":"$name","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Stream-static dedup-on-ingest (nearDupAgainst, q90's operator):
    // the reference corpus is FIXED; only the incoming side scales
    // (id-shifted copies in the SAME token space, so candidates really
    // hit the corpus bands and verified pairs grow with the factor).
    // Linear growth proves per-incoming-row work: the static profile is
    // built once per run and candidates come from band-bucket equality
    // against it — never incoming × corpus.
    if (wanted("neardup_ingest")) {
      val corpus = base.filter(col("doc_id") % 20 =!= 0)
      val inBase = base.filter(col("doc_id") % 20 === 0)
      for (f <- factors) {
        val inc = (0 until f).map(k =>
          inBase.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            col("text"))).reduce(_ union _)
        def run(): Long = TextDedup.nearDupAgainst(inc, corpus, 3000L).count()
        run() // warm
        val (sec, rows) = time(run())
        println(s"""{"op":"neardup_ingest","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
      }
    }

    // ProfileStore MERGE maintenance (q101's operator): the accumulated
    // store grows f×, the ingested delta batch stays FIXED — append
    // wall-clock must stay FLAT across f, because append profiles only
    // the delta and blind-appends (it never reads the store). The probe
    // row (fixed stream vs the f× store) is printed for context: it
    // scans the accumulated profile, so it may grow with f — that is
    // the read side, not the maintenance side.
    if (wanted("profile_store_append")) {
      val delta = base.filter(col("doc_id") % 20 === 0)
      val stream = base.filter(col("doc_id") % 20 === 1)
        .limit(2000).localCheckpoint(true)
      for (f <- factors) {
        val corpus = scaled(base.filter(col("doc_id") % 20 =!= 0), f)
        val path = java.nio.file.Files
          .createTempDirectory(s"pstore-scale-$f").toString
        graft.operators.ProfileStore.append(corpus, path) // setup: f× store
        graft.operators.ProfileStore.append(delta, path)  // warm
        val (sec, _) = time {
          graft.operators.ProfileStore.append(delta, path); 0L
        }
        def probe(): Long = graft.operators.ProfileStore.nearDupAgainstProfile(
          stream, graft.operators.ProfileStore.read(spark, path), 3000L).count()
        probe() // warm
        val (psec, rows) = time(probe())
        println(s"""{"op":"profile_store_append","factor":$f,"sec":${f"$sec%.2f"},""" +
          s""""probe_sec":${f"$psec%.2f"},"rows":$rows}""")
      }
    }

    // Hashed-projection text embedding (q107/q108's bridge op): one
    // token explode + one groupBy carrying all dims — linear or bust.
    if (wanted("text_embed")) {
      for (f <- factors) {
        val d = scaled(base, f)
        def run(): Long = graft.operators.TextEmbed
          .embedFixedPoint(d, "text", 16).count()
        run() // warm
        val (sec, rows) = time(run())
        println(s"""{"op":"text_embed","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
      }
    }

    // ---- vector operators over scaled embeddings ----
    // Copies are dimension-ROTATED (a cyclic shift of the 64 dims per
    // copy): rotation is an isometry, so every within-copy dot/norm/
    // pair is EXACTLY preserved, while cross-copy cosines between
    // rotated twins behave like random vectors and stay below the
    // near-dup cut — growth isolates the engine, not new pair structure.
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    def scaledEmb(factor: Int): DataFrame =
      (0 until factor).map { k =>
        val shift = (k * 7) % 64
        val rot = (0 until 64).map(i => col("embedding")((i + shift) % 64))
        embBase.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          array(rot: _*).as("embedding"))
      }.reduce(_ union _)

    // ClusterStore MAINTENANCE (q151's operator): the persisted label
    // store grows f×, the delta pair batch stays FIXED — applyDelta
    // wall-clock must stay ~FLAT across f: the only history-touching
    // step is the endpoint label probe (a broadcast lookup against the
    // base scan, no history shuffle), merges are label-level remap
    // entries, and the append is delta-sized. The read row is printed
    // for context (it scans the accumulated base — the read side, not
    // the maintenance side). Synthetic disjoint 2-cliques isolate the
    // store mechanics; pair GENERATION scaling is neardup_ingest's row.
    // SpanStore maintenance (q110/q111's operator): like the profile
    // store, append is blind (profiles only the delta batch) so its
    // wall-clock must stay FLAT as the accumulated store grows f×; the
    // read row is the store-scan side and may grow with f.
    if (wanted("span_store_append")) {
      import graft.operators.SpanStore
      val delta = base.filter(col("doc_id") % 20 === 0)
      for (f <- factors) {
        val corpus = scaled(base.filter(col("doc_id") % 20 =!= 0), f)
        val path = java.nio.file.Files
          .createTempDirectory(s"sstore-scale-$f").toString
        SpanStore.append(corpus, 5, path) // setup: f× store
        val (sec, _) = time { SpanStore.append(delta, 5, path); 0L }
        val (rsec, rows) = time(SpanStore.read(spark, path).count())
        println(s"""{"op":"span_store_append","factor":$f,"sec":${f"$sec%.2f"},""" +
          s""""read_sec":${f"$rsec%.2f"},"rows":$rows}""")
      }
    }

    if (wanted("cluster_store_delta")) {
      import graft.operators.ClusterStore
      for (f <- factors) {
        val n = 200000L * f
        val hist = spark.range(n)
          .select((col("id") * 2).as("d1"), (col("id") * 2 + 1).as("d2"))
        val path = java.nio.file.Files
          .createTempDirectory(s"cstore-scale-$f").toString
        ClusterStore.build(hist, "d1", "d2", path) // setup: f× store
        // warm the plan shapes on a throwaway store (applyDelta
        // mutates, so the real delta can only run once)
        val wpath = java.nio.file.Files
          .createTempDirectory(s"cstore-warm-$f").toString
        ClusterStore.build(spark.range(1000)
          .select((col("id") * 2).as("d1"), (col("id") * 2 + 1).as("d2")),
          "d1", "d2", wpath)
        ClusterStore.applyDelta(spark, wpath, spark.range(100)
          .select((col("id") * 4).as("d1"), (col("id") * 4 + 2).as("d2")),
          "d1", "d2")
        // fixed delta: 5k cluster merges + 5k brand-new pairs
        val delta = spark.range(5000)
          .select((col("id") * 4).as("d1"), (col("id") * 4 + 2).as("d2"))
          .union(spark.range(5000)
            .select((col("id") + 2000000000L).as("d1"),
              (col("id") + 2100000000L).as("d2")))
        val (sec, _) = time {
          ClusterStore.applyDelta(spark, path, delta, "d1", "d2"); 0L
        }
        val (rsec, rows) = time(ClusterStore.read(spark, path).count())
        println(s"""{"op":"cluster_store_delta","factor":$f,"sec":${f"$sec%.2f"},""" +
          s""""read_sec":${f"$rsec%.2f"},"rows":$rows}""")
      }
    }

    for (f <- factors if wanted("neardup_bucketed")) {
      val d = scaledEmb(f)
      // occupancy-preserving bits: +log2(factor) keeps per-bucket counts
      // flat as the corpus grows — the operating rule at real scale
      val nBits = 6 + (math.log(f.toDouble) / math.log(2.0)).ceil.toInt
      def run(): Long = graft.operators.Similarity.nearDupPairsBucketed(
        d, "vec_id", "embedding", lit(0.3), nBits, 64).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"neardup_bucketed","factor":$f,"bits":$nBits,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    for (f <- factors if wanted("kmeans_train2")) {
      val d = scaledEmb(f)
      val cent = embBase.filter(col("vec_id") % 200 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      def run(): Long = graft.operators.Similarity.kmeansTrain(
        d, "vec_id", "embedding", cent, iters = 2).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"kmeans_train2","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Semantic dedup: centroids come from the SCALED corpus (vec_id %
    // 200 per copy), so cluster count grows with the data and per-
    // cluster occupancy stays flat — the SemDeDup operating rule at
    // real scale (fixed centroids would grow clusters linearly and the
    // within-cluster pair stage quadratically).
    for (f <- factors if wanted("semantic_dedup")) {
      val d = scaledEmb(f)
      val cent = d.filter(col("vec_id") % 200 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      def run(): Long = graft.operators.Similarity.semanticDedup(
        d, "vec_id", "embedding", cent, lit(0.3)).filter(col("keep") === 0).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"semantic_dedup","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // q86's histogram-only quantile band filter (r6 one-scan rewrite):
    // corpus-sized work is ONE tokenize+histogram partial agg; the rank
    // arithmetic and kept-set aggregates run on histogram CELLS. Group
    // key = copy id, so group count grows with the corpus like real
    // languages and per-group cell counts stay flat. Linear growth here
    // proves the rewrite left no hidden second corpus pass.
    for (f <- factors if wanted("quantile_band")) {
      val d = scaled(base, f)
      def run(): Long = {
        import org.apache.spark.sql.expressions.Window
        val t = d.select(expr("doc_id div 1000000").as("lang"),
          size(filter(split(lower(col("text")), "[^a-z]+"), x => x =!= ""))
            .cast("long").as("n_tok"))
        val hist = t.groupBy(col("lang"), col("n_tok")).agg(count(lit(1)).as("c"))
        val cw = Window.partitionBy(col("lang")).orderBy(col("n_tok"))
        val nw = Window.partitionBy(col("lang"))
        def pick(p: Double) =
          min(when(col("hi") >= ceil(lit(p) * col("n")).cast("long"), col("n_tok"))).over(nw)
        hist.withColumn("hi", sum(col("c")).over(cw))
          .withColumn("n", sum(col("c")).over(nw))
          .withColumn("p10", pick(0.1)).withColumn("p90", pick(0.9))
          .filter(col("n_tok") >= col("p10") && col("n_tok") <= col("p90"))
          .groupBy(col("lang"))
          .agg(sum(col("c")).cast("long").as("n_kept"),
            sum(col("n_tok") * col("c")).cast("long").as("kept_tok"))
          .count()
      }
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"quantile_band","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Exact all-pairs near-dup WITH the r6 in-plan guard (1-row
    // broadcast count + raise_error referenced by the join condition):
    // quadratic BY DESIGN — the probe sizes stay inside maxRows and the
    // interesting signal is the guard's overhead staying O(1): the
    // factor curve must match the pure |n|² pair work (4× pairs from
    // 2×, ~arithmetic growth), with no extra per-factor constant.
    for (f <- factors.filter(_ <= 4) if wanted("neardup_exact_guarded")) {
      val d = scaledEmb(f).filter(col("vec_id") % 1000000L < 1500)
      def run(): Long = graft.operators.Similarity.nearDupPairs(
        d, "vec_id", "embedding", lit(0.3), maxRows = 100000L).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"neardup_exact_guarded","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Multimodal decode: synthesize + REAL-container decode + features
    // for audio (WAV chunk walk) and video (Y4M frame walk) — narrow
    // per-partition passes whose linearity confirms no hidden shuffle.
    for (f <- factors if wanted("media_decode")) {
      val d = scaled(base, f)
      def run(): Long = {
        val au = graft.multimodal.AudioVideo.audioFeatures(spark,
          graft.multimodal.AudioVideo.attachAudio(spark, d)).count()
        val vi = graft.multimodal.AudioVideo.videoFrames(spark,
          graft.multimodal.AudioVideo.attachVideo(spark, d)).count()
        au + vi
      }
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"media_decode","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Column profiling, one-pass Expand arm (the scale side of the q83
    // cost gate) over factor-scaled lineitem copies.
    val liBase = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    for (f <- factors if wanted("profile_onepass")) {
      val d = (0 until f).map(k =>
        liBase.select((col("l_orderkey") + lit(k * 100000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(k * 10000000L)).as("l_partkey"),
          col("l_suppkey"), col("l_quantity"))).reduce(_ union _)
      def run(): Long = graft.operators.Profiling.profileOnePass(
        d, Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"profile_onepass","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }
    // ---- round-9 analytics operators over scaled graphs/streams ----
    // Disjoint copies (shifted order/part/user ids) keep each copy's
    // structure identical — triangles/PageRank see f disjoint
    // co-purchase graphs, funnel/sweep see f disjoint user populations
    // — so measured growth isolates the engine, not new structure.
    val liGraph = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    def scaledGraph(f: Int): DataFrame =
      (0 until f).map(k =>
        liGraph.select((col("l_orderkey") + lit(k * 100000000L)).as("o"),
          (col("l_partkey") + lit(k * 10000000L)).as("p"))).reduce(_ union _)

    for (f <- factors if wanted("triangles")) {
      def run(): Long = graft.operators.Triangles.count(
        graft.operators.CoOccur.pairs(scaledGraph(f), "o", "p"), "a", "b")
        .head().getLong(2)
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"triangles","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    for (f <- factors if wanted("pagerank4")) {
      def run(): Long = graft.operators.PageRank.ranks(
        graft.operators.CoOccur.pairs(scaledGraph(f), "o", "p"),
        "a", "b", iters = 4).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"pagerank4","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Basket pair-support aggregation (q121's heavy leg) over f
    // disjoint copies of the FULL lineitem basket set.
    val liFull = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    for (f <- factors if wanted("basket_pairs")) {
      val d = (0 until f).map(k =>
        liFull.select((col("l_orderkey") + lit(k * 100000000L)).as("o"),
          (col("l_partkey") + lit(k * 10000000L)).as("p"))).reduce(_ union _)
      def run(): Long = graft.operators.CoOccur.pairs(d, "o", "p")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"basket_pairs","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // Funnel + interval sweep over f disjoint user populations (same
    // time range, so sweep concurrency grows with f — the deltas are
    // the scaling axis, the per-slice sort stays slice-sized).
    val evBase = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    def scaledEv(f: Int): DataFrame =
      (0 until f).map(k =>
        evBase.select((col("user_id") + lit(k * 1000000L)).as("user_id"),
          col("ts"), (col("event_id") + lit(k * 1000000000L)).as("event_id"),
          col("event_type"))).reduce(_ union _)

    for (f <- factors if wanted("funnel")) {
      def run(): Long = graft.operators.Funnel.report(scaledEv(f), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase")).head().getLong(0)
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"funnel","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    for (f <- factors if wanted("interval_sweep")) {
      def run(): Long = {
        val sess = graft.operators.SessionPaths.sessions(scaledEv(f), "user_id",
            "ts", "event_id", gapNs = 30L * 60L * 1000000000L)
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("t0"), (max(col("ts")) + 1).as("t1"))
        graft.operators.IntervalSweep.maxConcurrent(sess, "t0", "t1")
          .head().getLong(0)
      }
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"interval_sweep","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // ---- round-10 operators ----
    // LineDedup over f disjoint-token corpus copies (8-token lines, the
    // q137 rule): winner agg + join-back, both keyed on the line hash.
    for (f <- factors if wanted("line_dedup")) {
      val d = graft.operators.LineDedup.withChunkedLines(
        scaled(base, f).select(col("doc_id"), col("text")), "text", 8)
      def run(): Long = graft.operators.LineDedup.rebuild(d).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"line_dedup","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // LabelProp / KCore / Bfs with the driver-local gate FORCED SHUT:
    // the probe measures the DISTRIBUTED rounds (the 100 TB path the
    // gate hides at bench scale), over f disjoint co-purchase graphs.
    for (f <- factors if wanted("label_prop")) {
      spark.conf.set("spark.graft.labelprop.localEdgeMax", "0")
      try {
        def run(): Long = graft.operators.LabelProp.run(
          graft.operators.CoOccur.pairs(scaledGraph(f), "o", "p"),
          "a", "b", rounds = 3).count()
        run() // warm
        val (sec, rows) = time(run())
        println(s"""{"op":"label_prop","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
      } finally spark.conf.unset("spark.graft.labelprop.localEdgeMax")
    }

    for (f <- factors if wanted("kcore_delta")) {
      spark.conf.set("spark.graft.kcore.localEdgeMax", "0")
      try {
        def run(): Long = graft.operators.KCore.peel(
          graft.operators.CoOccur.pairs(scaledGraph(f), "o", "p"),
          "a", "b", k = 8, rounds = 8).count()
        run() // warm
        val (sec, rows) = time(run())
        println(s"""{"op":"kcore_delta","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
      } finally spark.conf.unset("spark.graft.kcore.localEdgeMax")
    }

    for (f <- factors if wanted("bfs_distributed")) {
      spark.conf.set("spark.graft.bfs.localEdgeMax", "0")
      try {
        def run(): Long = {
          val e0 = graft.operators.CoOccur.pairs(scaledGraph(f), "o", "p")
          val dir = e0.select(col("a").as("u"), col("b").as("v"))
            .unionAll(e0.select(col("b").as("u"), col("a").as("v")))
            .localCheckpoint(true)
          val seeds = dir.select(col("u")).distinct()
            .filter(col("u") % 97 === 0)
          graft.operators.Bfs.hops(dir, "u", "v", seeds, maxHops = 3).count()
        }
        run() // warm
        val (sec, rows) = time(run())
        println(s"""{"op":"bfs_distributed","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
      } finally spark.conf.unset("spark.graft.bfs.localEdgeMax")
    }

    // QuantileSketch bottom-k over f disjoint lineitem copies: the
    // group count stays fixed while rows grow f× — the map-side
    // WindowGroupLimit must keep the shuffle k-bounded (flat output).
    for (f <- factors if wanted("quantile_sketch")) {
      val d = (0 until f).map(k =>
        liFull.select(col("l_partkey"),
          (col("l_orderkey") + lit(k * 100000000L)).as("o")))
        .reduce(_ union _)
        .select((col("o") % 3).cast("string").as("g"),
          (col("l_partkey") % 100000).as("v"),
          concat_ws("-", col("o"), col("l_partkey")).as("kid"))
      def run(): Long = graft.operators.QuantileSketch
        .bottomK(d, "g", "v", "kid", 128).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"quantile_sketch","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // TableDiff over f disjoint orders copies (the q138 snapshot rule):
    // two scans to 16-byte fingerprints + one key-partitioned join.
    for (f <- factors if wanted("table_diff")) {
      val o = Tables.orders(spark, sfDir)
      val d = (0 until f).map(k =>
        o.select((col("o_orderkey") + lit(k * 100000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))).reduce(_ union _)
      val older = d.filter(col("o_orderkey") % 10 =!= 3)
      val newer = d.filter(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      def run(): Long = graft.operators.TableDiff
        .diff(older, newer, "o_orderkey")
        .groupBy(col("status")).agg(count(lit(1))).count()
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"table_diff","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    // PowerIteration Gram build (the distributed pass; the iteration
    // itself runs on the fixed d×d aggregate) over f rotated embedding
    // copies: one typed-Aggregator pass with the flat d×d long-array
    // buffer (r11 rewrite — fan-out partitions×d², no generated rows).
    for (f <- factors if wanted("power_gram")) {
      val d = scaledEmb(f)
      def run(): Long = graft.operators.PowerIteration
        .gramFlat(d, "embedding").length.toLong
      run() // warm
      val (sec, rows) = time(run())
      println(s"""{"op":"power_gram","factor":$f,"sec":${f"$sec%.2f"},"rows":$rows}""")
    }

    spark.stop()
  }
}
