package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.cdc.{Sharding, TemplateEngine}

/** Property-based invariants (SURVEY.md §5.4), generated with ScalaCheck
  * under a fixed seed (raw Gen sampling — the scalatest bridge artifact
  * is not vendored). Spark-level properties use the shared session on
  * small generated batches; pure-function properties (shard assignment,
  * template render) run driver-side.
  */
class PropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seedNo: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seedNo))

  private def cases[A](g: Gen[A], n: Int)(check: A => Unit): Unit =
    (1 to n).foreach(i => check(sample(g, 42L + i)))

  // ---- shard partition: exactly-one owner, union = all, both hash modes ----

  test("every key is owned by exactly one shard (FNV parity mode)") {
    cases(Gen.zip(Gen.long, Gen.choose(1, 16)), 200) { case (pos, count) =>
      val owners = (0 until count).filter(i =>
        Sharding.fnvShardOfPosition(pos, count) == i)
      assert(owners.size === 1)
    }
  }

  test("FNV shard of sequential even-step positions stays balanced (ref regression)") {
    // Port of blsenderwork_test.go:90-121: raw pos % count would collapse
    // even-step positions onto a few shards; FNV must spread them.
    val count = 3
    val positions = (0 until 3000).map(i => 4L + i * 150L)
    val byShard = positions.groupBy(p => Sharding.fnvShardOfPosition(p, count))
    assert(byShard.keySet === (0 until count).toSet)
    val ideal = positions.size.toDouble / count
    byShard.values.foreach { g =>
      assert(math.abs(g.size - ideal) / ideal <= 0.2,
        s"skew over 20%: ${byShard.view.mapValues(_.size).toMap}")
    }
  }

  test("murmur3 shard filter partitions a batch: exactly-one & union = all") {
    import spark.implicits._
    val count = 4
    val df = (1 to 500).map(i => (i.toLong, "mysql-bin.000001", 4L + i * 40L))
      .toDF("itemID", "binlogFile", "binlogPosition")
      .select(col("itemID"),
        struct(col("binlogFile"), col("binlogPosition")).as("log"))
    val owned = (0 until count).map { idx =>
      df.filter(Sharding.shardFilter(count, idx, None)).count()
    }
    assert(owned.sum === 500L) // union = all, no row double-owned
    val withId = df.select(Sharding.shardId(count, None, Sharding.Murmur3).as("sid"))
    assert(withId.filter(col("sid") < 0 || col("sid") >= count).count() === 0L)
  }

  // ---- template render is total over arbitrary row maps ----

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr, Gen.long, Gen.double, Gen.const(null),
    Gen.oneOf(true, false))

  private val rowGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), scalarGen))

  test("Canon.divL equals exact integral division for arbitrary longs") {
    val s = spark
    import s.implicits._
    // batched: one Spark job for all 400 generated values, incl. the
    // >2^53 band where double division rounds (the r6 ADVICE defect)
    val vals = (1 to 400).map(i => sample(Gen.oneOf(
      Gen.long, Gen.choose(1L << 53, Long.MaxValue),
      Gen.choose(1600000000000000000L, 1800000000000000000L)), 7000L + i))
    val got = vals.toDF("v").select(Canon.divL(col("v"), 1000L)).as[Long].collect()
    assert(got.toSeq == vals.map(_ / 1000L))
  }

  test("template render never throws on arbitrary rows (total function)") {
    val nodes = TemplateEngine.parse(
      """{"op":"{{ .Data.Operation }}","rows":{{ .Data.Rows | toJson }},"x":{{ .Data.Missing | toJson }}}""")
    cases(Gen.zip(Gen.listOf(rowGen), Gen.alphaNumStr), 100) { case (rows, op) =>
      val root: Any = Map(
        "ItemID" -> 1L,
        "Data" -> Map("Operation" -> op, "Rows" -> rows))
      val out = TemplateEngine.render(nodes, root)
      assert(out.nonEmpty)
    }
  }

  test("toJson round-trips through a strict parser for arbitrary rows") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    cases(Gen.listOf(rowGen), 100) { rows =>
      val json = TemplateEngine.toJson(rows)
      mapper.readTree(json) // throws on malformed output
    }
  }

  // ---- dedup idempotence & explode/collect identity ----

  test("dropDuplicates is idempotent on generated batches") {
    import spark.implicits._
    cases(Gen.listOfN(200, Gen.zip(Gen.choose(1, 20), Gen.choose(1, 5))), 3) { pairs =>
      val df = pairs.toDF("k", "v")
      val once = df.dropDuplicates(Seq("k", "v"))
      val twice = once.dropDuplicates(Seq("k", "v"))
      assert(once.count() === twice.count())
      assert(once.exceptAll(twice).count() === 0L)
    }
  }

  test("strHash column matches a driver-side model for arbitrary token text") {
    import spark.implicits._
    def model(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 1000000007L)
    val tokenGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    cases(Gen.listOfN(50, tokenGen), 3) { toks =>
      val got = toks.toDF("t")
        .select(col("t"), graft.operators.TextDedup.strHash(col("t")).as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      toks.foreach(t => assert(got(t) === model(t), s"token $t"))
    }
  }

  test("TokenSpanHashes kernel equals the interpreted HOF chain for arbitrary tokens") {
    import spark.implicits._
    val P = 1000000007L
    val tokenGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    // include repeats so the distinct path is actually exercised
    val docGen = Gen.listOfN(30, Gen.frequency(
      (3, tokenGen), (2, Gen.oneOf("aa", "bb", "cc"))))
    for (w <- Seq(1, 2, 5)) {
      cases(Gen.listOfN(8, docGen), 2) { docs =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
          .toDF("doc_id", "text")
        val toks = graft.operators.TextDedup.toks(col("text"))
        val th = transform(toks, t => graft.operators.TextDedup.strHash(t))
        val hof = df.select(col("doc_id"),
          when(size(th) >= w,
            array_distinct(transform(sequence(lit(0), size(th) - w),
              i => aggregate(slice(th, i + 1, lit(w)), lit(0L),
                (a, x) => (a * 8191L + x) % P))))
            .otherwise(array().cast("array<bigint>")).as("hs"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val kernel = df.select(col("doc_id"),
          graft.functions.TokenSpanHashes.tokenSpanHashes(toks, w).as("hs"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(kernel === hof, s"w=$w")
      }
    }
  }

  test("sequence packing: bins are contiguous and overflow by at most one doc") {
    import spark.implicits._
    val budget = 64L
    cases(Gen.listOfN(80, Gen.choose(1L, 40L)), 3) { lens =>
      val items = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val packed = graft.operators.SequencePacking
        .pack(items.toDF("doc_id", "n_tok"), "doc_id", "n_tok", budget)
        .select("doc_id", "n_tok", "bin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      // bins appear in nondecreasing order over the id order
      assert(packed.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
      // every doc lands in bin floor(cum_before/budget): each bin's token
      // total exceeds the budget by at most its last doc's length
      packed.groupBy(_._3).foreach { case (_, docs) =>
        val total = docs.map(_._2).sum
        assert(total < budget + docs.map(_._2).max,
          s"bin overflows by a full doc: $docs")
      }
    }
  }

  test("kmeansStep conserves vectors: per-dim assigned counts sum to base size") {
    import spark.implicits._
    val base = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d) % 5).toFloat)))
      .toDF("id", "v")
    val cents = (0L until 3L).map(c =>
      (c, Array.tabulate(4)(d => ((c * 3 + d) % 5).toFloat)))
      .toDF("cid", "cv")
    val step = graft.operators.Similarity.kmeansStep(base, "id", "v", cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // each dimension partitions the 40 vectors exactly once
    step.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum === 40L)
    }
    // every cluster emits all 4 dims or none
    step.groupBy(_._1).foreach { case (_, rows) => assert(rows.length === 4) }
  }

  test("WAV and Y4M codecs round-trip arbitrary payloads bit-exactly") {
    import graft.multimodal.AudioVideo.{WavCodec, Y4mCodec}
    cases(Gen.zip(Gen.choose(1, 2000), Gen.long), 60) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val pcm = WavCodec.Pcm(8000, Array.fill(n)(rnd.nextInt(65536).toShort))
      val dec = WavCodec.decode(WavCodec.encode(pcm))
      assert(dec.samples.toSeq === pcm.samples.toSeq)
    }
    cases(Gen.zip(Gen.choose(1, 8), Gen.oneOf("444", "420jpeg"), Gen.long), 60) {
      case (nf, chroma, seed) =>
        val rnd = new scala.util.Random(seed)
        val v = Y4mCodec.Video(8, 4, chroma,
          Array.fill(nf)(Array.fill(32)(rnd.nextInt(256).toByte)))
        val dec = Y4mCodec.decode(Y4mCodec.encode(v, (_, _) => rnd.nextInt(256).toByte))
        assert(dec.yPlanes.length === nf)
        v.yPlanes.indices.foreach(f =>
          assert(dec.yPlanes(f).toSeq === v.yPlanes(f).toSeq))
    }
  }

  test("PNG codec round-trips arbitrary pixel data bit-exactly (RGB and RGBA)") {
    import graft.multimodal.PngCodec
    cases(Gen.zip(Gen.choose(1, 24), Gen.choose(1, 24),
        Gen.oneOf(2, 6), Gen.long), 60) { case (w, h, ct, seed) =>
      val rnd = new scala.util.Random(seed)
      val bpp = if (ct == 6) 4 else 3
      val src = PngCodec.Png(w, h, ct,
        Array.fill(bpp * w * h)(rnd.nextInt(256).toByte))
      val dec = PngCodec.decode(PngCodec.encode(src))
      assert(dec.width === w && dec.height === h && dec.colorType === ct)
      assert(dec.pix.toSeq === src.pix.toSeq)
    }
  }

  test("BPE trainTraceLocal equals the distributed loop on arbitrary corpora") {
    import graft.operators.BpeTrain
    import spark.implicits._
    val wordGen = Gen.listOfN(6, Gen.choose(1, 5)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    cases(Gen.zip(wordGen, Gen.choose(1, 6)), 12) { case (words, merges) =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val key = "spark.graft.bpe.localVocabMax"
      val local = BpeTrain.trainTrace(docs, "text", merges)
      val prev = spark.conf.getOption(key)
      try {
        spark.conf.set(key, "0")
        assert(BpeTrain.trainTrace(docs, "text", merges) === local)
      } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
  }

  test("hashSample keeps exactly the ids a driver-side model predicts") {
    import graft.operators.Sampling
    import spark.implicits._
    cases(Gen.zip(Gen.listOfN(40, Gen.choose(0L, 1000000L)),
        Gen.choose(0L, 1000000L)), 25) { case (ids, rate) =>
      val kept = Sampling.hashSample(
          ids.distinct.toDF("doc_id"), "doc_id", lit(rate))
        .collect().map(_.getLong(0)).toSet
      val model = ids.distinct.filter(i =>
        ((i % 1000000007L) * 40503L + 17L) % 1000000007L % 1000000L < rate).toSet
      assert(kept === model)
    }
  }

  test("BPE mergeOnce never increases length and preserves concatenation") {
    import graft.operators.BpeTrain
    val symGen = Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "bc")).map(_.toSeq)
    cases(Gen.zip(symGen, Gen.oneOf("a", "b", "ab"), Gen.oneOf("a", "b", "c")), 200) {
      case (syms, l, r) =>
        val merged = BpeTrain.mergeOnce(syms, l, r)
        assert(merged.length <= syms.length)
        assert(merged.mkString === syms.mkString) // symbols only fuse, never mutate
        // no adjacent (l, r) survives a full merge pass at the seam the
        // scan visited (greedy L2R leaves no un-merged adjacent pair
        // whose LEFT symbol existed before the pass)
        merged.sliding(2).foreach {
          case Seq(x, y) => assert(!(x == l && y == r))
          case _ => ()
        }
    }
  }

  test("removeDuplicateSpans matches a brute-force reference on tiny-alphabet corpora") {
    import spark.implicits._
    // token alphabet of 3 -> dense span collisions, the op's stress case
    val docGen = Gen.listOfN(8,
      Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c"))))
    val w = 3
    def ref(docs: Seq[(Long, Seq[String])]): Map[Long, Seq[String]] = {
      val occ = for { (id, ts) <- docs; i <- 0 to ts.length - w }
        yield (ts.slice(i, i + w), id, i)
      val first = occ.groupBy(_._1).map { case (k, os) =>
        k -> os.map(o => (o._2, o._3)).min }
      val drops = occ.filter(o => first(o._1) != ((o._2, o._3)))
        .flatMap(o => (o._3 until o._3 + w).map(idx => (o._2, idx)))
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
      docs.map { case (id, ts) =>
        id -> ts.zipWithIndex
          .filterNot { case (_, i) => drops.getOrElse(id, Set.empty[Int])(i) }
          .map(_._1)
      }.toMap
    }
    cases(docGen, 12) { tokLists =>
      val docs = tokLists.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.toSeq) }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.TextDedup.removeDuplicateSpans(df, w)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val want = ref(docs)
      docs.foreach { case (id, ts) =>
        val (nToks, nKept, clean) = got(id)
        assert(nToks == ts.length.toLong, s"doc $id n_toks")
        assert(clean == want(id).mkString(" "), s"doc $id text")
        assert(nKept == want(id).length.toLong, s"doc $id n_kept")
      }
    }
  }

  test("decontaminateStream admits NO false negatives on generated corpora") {
    import spark.implicits._
    // the gate's safety contract: a doc sharing any 5-token span with
    // the eval set MUST flag (false positives are allowed and bounded
    // by fpp; false negatives never). Generate eval docs and derive
    // contaminated docs by embedding a random eval window verbatim.
    val word = Gen.listOfN(3, Gen.oneOf("ka", "re", "mo", "ta", "li", "zu"))
      .map(_.mkString)
    val docGen = Gen.listOfN(12, word).map(_.mkString(" "))
    cases(Gen.listOfN(3, docGen), 8) { evalTexts =>
      val evalSet = evalTexts.zipWithIndex
        .map { case (t, i) => (900L + i, t) }.toDF("doc_id", "text")
      // contaminated: 5 consecutive eval tokens embedded mid-doc
      val contaminated = evalTexts.zipWithIndex.map { case (t, i) =>
        val span = t.split(" ").slice(3, 8).mkString(" ")
        (100L + i, s"zzzz prefix $span suffix qqqq")
      }
      val clean = Seq((1L, "totally fresh unrelated words nothing shared whatsoever here"))
      val batch = (contaminated ++ clean).toDF("doc_id", "text")
      val (flagged, handle) = graft.operators.SketchFilter.decontaminateStream(
        batch, "text", evalSet, "text", 5, 1000L)
      try {
        val got = flagged.select("doc_id", "contaminated")
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        contaminated.foreach { case (id, _) =>
          assert(got(id), s"doc $id embeds an eval span and MUST flag")
        }
      } finally handle.destroy()
    }
  }

  test("boxHalve: output dims are ceil(w/2) x ceil(h/2), means stay in box bounds") {
    import graft.multimodal.Multimodal.ImageCodecs
    import ImageCodecs.Image
    val gen = Gen.zip(Gen.choose(1, 9), Gen.choose(1, 9), Gen.long)
    cases(gen, 20) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val img = Image(w, h, Array.fill(3 * w * h)(rnd.nextInt(256).toByte))
      val rz = ImageCodecs.boxHalve(img)
      assert(rz.width == (w + 1) / 2 && rz.height == (h + 1) / 2)
      def px(im: Image, x: Int, y: Int, c: Int): Int =
        im.rgb(3 * (im.width * y + x) + c) & 0xff
      for (oy <- 0 until rz.height; ox <- 0 until rz.width; c <- 0 until 3) {
        val srcs = for {
          dy <- 0 to 1; dx <- 0 to 1
          if 2 * oy + dy < h && 2 * ox + dx < w
        } yield px(img, 2 * ox + dx, 2 * oy + dy, c)
        val v = px(rz, ox, oy, c)
        assert(v >= srcs.min && v <= srcs.max,
          s"($ox,$oy,$c): $v outside [${srcs.min},${srcs.max}]")
        assert(v == srcs.sum / srcs.size, s"($ox,$oy,$c): not the truncating mean")
      }
    }
  }

  test("zvalue SQL registration matches the independent scalar reference on random longs") {
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, (1L << 31) - 1), Gen.choose(0L, (1L << 31) - 1)))
    GraftExtensions.register(spark)
    cases(gen, 3) { pairs =>
      val df = pairs.toDF("x", "y")
      df.createOrReplaceTempView("zprop")
      val got = spark.sql("SELECT x, y, zvalue(x, y, 31) AS z FROM zprop")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      pairs.foreach { case (x, y) =>
        assert(got((x, y)) == graft.operators.ZOrder.zValueRef(x, y, 31))
      }
    }
  }

  test("encodeTokens with no merges counts characters; merges never increase symbols") {
    import spark.implicits._
    val word = Gen.listOfN(4, Gen.oneOf("ab", "ba", "abc"))
    val docGen = Gen.listOfN(6, word.map(_.mkString)).map(_.mkString(" "))
    cases(Gen.listOfN(4, docGen), 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val zero = graft.operators.BpeTrain.encodeTokens(
          spark, docs, "text", "doc_id", Seq.empty)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val nChars = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).map(_.length).sum
        assert(zero(i.toLong) == nChars, s"doc $i: zero-merge = char count")
      }
      val merges = graft.operators.BpeTrain.train(docs, "text", 3)
      val enc = graft.operators.BpeTrain.encodeTokens(
          spark, docs, "text", "doc_id", merges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      enc.foreach { case (id, n) =>
        assert(n <= zero(id), s"doc $id: merges must never increase symbol count")
      }
    }
  }

  test("explode then collect_list rebuilds the original multiset per key") {
    import spark.implicits._
    val data = Seq((1L, Seq("a", "b", "b")), (2L, Seq("x")), (3L, Seq.empty[String]))
    val df = data.toDF("k", "xs")
    val rebuilt = df.select(col("k"), explode(col("xs")).as("x"))
      .groupBy(col("k")).agg(sort_array(collect_list(col("x"))).as("xs"))
      .as[(Long, Seq[String])].collect().toMap
    data.filter(_._2.nonEmpty).foreach { case (k, xs) =>
      assert(rebuilt(k) === xs.sorted)
    }
    assert(!rebuilt.contains(3L)) // explode drops empty arrays (inner semantics)
  }
}
