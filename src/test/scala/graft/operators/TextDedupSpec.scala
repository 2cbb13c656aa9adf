package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Library-facade dedup operators. The LSH pipeline itself is
  * hash-verified against DuckDB via q33 each round; these cover the
  * facade-only paths. */
class TextDedupSpec extends SparkTestBase {

  test("exact dedup keeps one min-id representative per content") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (3L, "same text"), (1L, "same text"), (2L, "same text"),
      (5L, "other"), (4L, "third")).toDF("doc_id", "text")
    val kept = TextDedup.exact(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L))
    // idempotent
    val twice = TextDedup.exact(TextDedup.exact(df, "doc_id", "text"), "doc_id", "text")
    assert(twice.count() === 3L)
  }

  test("nearDupAgainst flags streamed docs that near-duplicate the corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (100L, base),
      (200L, "completely different content about spark catalyst execution plans"))
      .toDF("doc_id", "text")
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = TextDedup.nearDupAgainst(
      in.toDF().toDF("doc_id", "text"), corpus, 3000L)
    val q = out.writeStream.format("memory").queryName("neardup_ingest")
      .outputMode("append").start()
    try {
      in.addData((1L, base.replace("today", "tomorrow")), // near-dup of 100
        (2L, "totally unrelated words about cooking pasta at home tonight"))
      q.processAllAvailable()
      val got = s.sql(
        "SELECT DISTINCT doc_id, ref_doc_id FROM neardup_ingest")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 100L)))
      // second batch: an exact copy of a corpus doc also flags
      in.addData((3L, base))
      q.processAllAvailable()
      val got2 = s.sql(
        "SELECT DISTINCT doc_id, ref_doc_id FROM neardup_ingest WHERE doc_id = 3")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 === Set((3L, 100L)))
    } finally q.stop()
  }

  test("nearDupPairs finds injected near-duplicates and skips unrelated docs") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different content about spark catalyst execution plans"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = TextDedup.nearDupPairs(df, 3000L)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("removeDuplicateSpans keeps first occurrences, rewrites the rest") {
    val s = spark
    import s.implicits._
    // w=3. doc1 owns every canonical span; doc2 repeats (a b c) and
    // (b c d) so indices 1..4 drop, keeping "x y"; doc3 repeats
    // (a b c) twice (cross-doc AND in-doc) so 0..5 drop, keeping "z";
    // doc4 is shorter than the window and passes through untouched.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c d y"),
      (3L, "a b c a b c z"),
      (4L, "p q")).toDF("doc_id", "text")
    val got = TextDedup.removeDuplicateSpans(df, 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 5L, 5L, "a b c d e"),
      (2L, 6L, 2L, "x y"),
      (3L, 7L, 1L, "z"),
      (4L, 2L, 2L, "p q")))
    // idempotent: a second pass finds no remaining duplicate spans
    val again = TextDedup.removeDuplicateSpans(
      TextDedup.removeDuplicateSpans(df, 3)
        .select(col("doc_id"), col("clean_text").as("text")), 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(again.toSeq === Seq(
      (1L, "a b c d e"), (2L, "x y"), (3L, "z"), (4L, "p q")))
  }

  test("removeStoredSpans scrubs history spans, keeps in-batch dups by contract") {
    val s = spark
    import s.implicits._
    val hist = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("spanstore").toString
    SpanStore.append(hist, 3, path)
    SpanStore.append(Seq((2L, "p q r s")).toDF("doc_id", "text"), 3, path)
    val store = SpanStore.read(s, path)
    val incoming = Seq(
      (10L, "x a b c d y"),   // history span (a b c)+(b c d) → drop idx 1..4
      (11L, "p q r p q r"),   // store hit (p q r) at BOTH positions: all 6 drop
      (12L, "m n o m n o"),   // in-batch repetition only: kept (by contract)
      (13L, "z z")).toDF("doc_id", "text") // shorter than w: untouched
    val got = TextDedup.removeStoredSpans(incoming, 3, store)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (10L, 2L, "x y"),
      (11L, 0L, ""),
      (12L, 6L, "m n o m n o"),
      (13L, 2L, "z z")))
    // batch-by-batch replay equals the one-shot q91 rewrite on the
    // incoming rows when the incoming batch carries no cross-history
    // canonical inversions (history ids precede incoming ids)
    val oneShot = TextDedup.removeDuplicateSpans(
        Seq((1L, "a b c d e"), (2L, "p q r s"), (10L, "x a b c d y"))
          .toDF("doc_id", "text"), 3)
      .filter(col("doc_id") === 10L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(oneShot.toSeq === Seq((10L, 2L, "x y")))
  }

  test("removeDuplicateSpans refuses out-of-range doc_id loudly") {
    // The encoded canonical ordering (doc_id·10^7 + pos) silently
    // corrupts first-occurrence selection for negative or overflowing
    // ids — both must fail loudly like the pos bound does (r8 advisory).
    val s = spark
    import s.implicits._
    for (bad <- Seq(-1L, Long.MaxValue / 10000000L)) {
      val df = Seq((bad, "a b c d"), (5L, "a b c e")).toDF("doc_id", "text")
      val e = intercept[Exception] {
        TextDedup.removeDuplicateSpans(df, 3).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("doc_id outside")), e.toString)
    }
  }
}
