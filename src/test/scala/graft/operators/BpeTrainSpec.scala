package graft.operators

import graft.SparkTestBase

class BpeTrainSpec extends SparkTestBase {

  test("mergeOnce is the greedy left-to-right scan") {
    assert(BpeTrain.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrain.mergeOnce(Seq("a", "b", "a", "b", "a"), "a", "b") ==
      Seq("ab", "ab", "a"))
    assert(BpeTrain.mergeOnce(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    // multi-char symbols never match across their boundary
    assert(BpeTrain.mergeOnce(Seq("ba", "b"), "a", "b") == Seq("ba", "b"))
  }

  test("train learns the published worked example's merge sequence") {
    // Sennrich et al. 2016 §3.2 vocabulary: low×5, lower×2, newest×6,
    // widest×3. Merge sequence under the declared deterministic
    // tie-break (freq desc, then lexicographic pair): (e,s) 9 →
    // (es,t) 9 → (l,o) 7 → (lo,w) 7 → (e,w) 6 (the 6-frequency tie
    // {(e,w),(n,e),(w,est)} resolves to its smallest member).
    val s = spark
    import s.implicits._
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", 5)
    assert(merges.map(m => (m.left, m.right, m.freq)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L),
      ("lo", "w", 7L), ("e", "w", 6L)))
    // encoding with the learned merges reproduces the paper's segments
    assert(BpeTrain.encodeWord("newest", merges) == Seq("n", "ew", "est"))
    assert(BpeTrain.encodeWord("lowest", merges) == Seq("low", "est"))
    assert(BpeTrain.encodeWord("low", merges) == Seq("low"))
  }

  test("empty or token-free corpus trains to the empty merge list") {
    // zero word rows make sum(cnt) a SQL NULL — must degrade to
    // Seq.empty like it always did, not NPE (r8 review finding)
    val s = spark
    import s.implicits._
    assert(BpeTrain.train(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "text", 3) == Seq.empty)
    assert(BpeTrain.trainTrace(Seq((1L, "123 456 !!")).toDF("doc_id", "text"),
      "text", 3) == Seq.empty)
  }

  test("gate-below (driver-local) and gate-above (distributed) branches agree") {
    // The cost gate (spark.graft.bpe.localVocabMax) must never change
    // answers: run the same corpus through the default gate (vocabulary
    // far under the cap → trainTraceLocal) and with the cap forced to 0
    // (→ the distributed loop), and require trace equality — winning
    // pairs, frequencies, tie-breaks, and post-round symbol totals.
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog the thee then"))
      .toDF("doc_id", "text")
    val key = "spark.graft.bpe.localVocabMax"
    val localTrace = BpeTrain.trainTrace(docs, "text", 6)
    assert(localTrace.nonEmpty)
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "0") // vocabulary > 0 rows → distributed branch
      val distTrace = BpeTrain.trainTrace(docs, "text", 6)
      assert(distTrace == localTrace)
    } finally { prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v)) }
  }

  test("train stops early when no pair repeats; encode counts distribute") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab cd"), (2L, "ef")).toDF("doc_id", "text")
    // each word collapses to one symbol in lexicographic pick order;
    // the 4th round finds no adjacent pair left and stops the loop
    val merges = BpeTrain.train(docs, "text", 10)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("c", "d"), ("e", "f")))
    assert(merges.forall(_.freq == 1L))
    val enc = BpeTrain.encodeTokens(spark, docs, "text", "doc_id",
      merges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // with all pairs merged each word is one symbol
    assert(enc(1L) == 2L && enc(2L) == 1L)
  }
}
