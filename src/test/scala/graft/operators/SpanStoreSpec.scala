package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** SpanStore compaction: the distinct-rewrite + pointer-swing cadence
  * that keeps the scrub probe's build side at DISTINCT spans while
  * ingest blind-appends accumulate cross-batch duplicates. The
  * answer-preservation contract is ALSO under the oracle gate every
  * round (q111 hash-matches q110's DuckDB twin); these cover the store
  * mechanics the oracle can't see. */
class SpanStoreSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("spanstore-spec").toString

  test("compact shrinks cross-batch duplicates and preserves membership") {
    val s = spark
    import s.implicits._
    val path = tmp()
    // the two batches share spans (a b c / b c d) — blind appends keep
    // both copies, compaction must collapse them
    SpanStore.append(Seq((1L, "a b c d e")).toDF("doc_id", "text"), 3, path)
    SpanStore.append(Seq((2L, "a b c d x")).toDF("doc_id", "text"), 3, path)
    val rawRows = SpanStore.read(s, path).count()
    val rawSet = SpanStore.read(s, path).distinct().collect()
      .map(_.getLong(0)).toSet
    val (before, after) = SpanStore.compact(s, path)
    assert(before === rawRows)
    assert(after === rawSet.size)
    assert(after < before) // (a b c) and (b c d) were stored twice
    val compacted = SpanStore.read(s, path).collect().map(_.getLong(0))
    assert(compacted.length === compacted.distinct.length)
    assert(compacted.toSet === rawSet)
  }

  test("scrub over a compacted store equals scrub over the raw store") {
    val s = spark
    import s.implicits._
    val hist1 = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val hist2 = Seq((2L, "c d e f g")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "x a b c y"), (11L, "d e f d e f"), (12L, "m n o"))
      .toDF("doc_id", "text")
    val raw = tmp(); val comp = tmp()
    for (p <- Seq(raw, comp)) {
      SpanStore.append(hist1, 3, p); SpanStore.append(hist2, 3, p)
    }
    SpanStore.compact(s, comp)
    def scrub(p: String) = TextDedup
      .removeStoredSpans(incoming, 3, SpanStore.read(s, p))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(scrub(comp) === scrub(raw))
  }

  test("append after compact lands in the delta and the view unions both") {
    val s = spark
    import s.implicits._
    val path = tmp()
    SpanStore.append(Seq((1L, "a b c")).toDF("doc_id", "text"), 3, path)
    SpanStore.compact(s, path)
    SpanStore.append(Seq((2L, "x y z")).toDF("doc_id", "text"), 3, path)
    assert(SpanStore.read(s, path).count() === 2L) // 1 base + 1 delta span
    // second compact folds the delta in and bumps the generation
    val (_, after) = SpanStore.compact(s, path)
    assert(after === 2L)
    assert(SpanStore.read(s, path).count() === 2L)
    // old generations and the delta are gone — only base-000001 + meta
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(dirs.contains("base-000001"))
    assert(!dirs.contains("base-000000"))
    assert(!dirs.contains("delta"))
  }

  test("a compact rerun after meta loss writes a FRESH generation above what's on disk") {
    // the r10 review scenario: a compact that crashed between the base
    // write and the meta rename leaves base-N with no meta; the rerun
    // must NOT overwrite base-N (read()'s fallback is scanning it) and
    // must land strictly above it
    val s = spark
    import s.implicits._
    val path = tmp()
    SpanStore.append(Seq((1L, "a b c d")).toDF("doc_id", "text"), 3, path)
    SpanStore.compact(s, path) // base-000000 + meta
    val expect = SpanStore.read(s, path).collect().map(_.getLong(0)).toSet
    // simulate the crash window: meta gone, orphan base remains
    new java.io.File(s"$path/_store_meta.json").delete()
    val (_, after) = SpanStore.compact(s, path)
    assert(after === expect.size.toLong)
    assert(SpanStore.read(s, path).collect().map(_.getLong(0)).toSet === expect)
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(dirs.contains("base-000001"), dirs.toString)
  }

  test("compactIfNeeded on a virgin path is a no-op, not a crash") {
    val s = spark
    assert(SpanStore.compactIfNeeded(s, tmp()).isEmpty)
  }

  test("read falls back to the newest base when the meta file is absent") {
    // defense against a crash between meta delete and rename on a
    // non-atomic FS: the view must still include the compacted base,
    // never silently degrade to delta-only (an under-scrubbing view)
    val s = spark
    import s.implicits._
    val path = tmp()
    SpanStore.append(Seq((1L, "a b c d")).toDF("doc_id", "text"), 3, path)
    SpanStore.compact(s, path)
    val full = SpanStore.read(s, path).collect().map(_.getLong(0)).toSet
    assert(new java.io.File(s"$path/_store_meta.json").delete())
    assert(SpanStore.read(s, path).collect().map(_.getLong(0)).toSet === full)
  }

  test("compactIfNeeded follows the delta-ratio cadence") {
    val s = spark
    import s.implicits._
    val path = tmp()
    // never-compacted store with a delta: always compacts
    SpanStore.append(
      Seq((1L, "a b c d e f g h i j k l")).toDF("doc_id", "text"), 3, path)
    assert(SpanStore.compactIfNeeded(s, path).nonEmpty)
    val baseRows = SpanStore.read(s, path).count()
    // tiny delta below the ratio: no-op
    SpanStore.append(Seq((2L, "q r s")).toDF("doc_id", "text"), 3, path)
    assert(SpanStore.compactIfNeeded(s, path, maxDeltaRatio = 0.5).isEmpty)
    // the skipped delta still serves reads
    assert(SpanStore.read(s, path).count() === baseRows + 1)
    // delta outgrows the ratio: fires and folds it in
    SpanStore.append(
      Seq((3L, "t u v w x y z a1 b1 c1")).toDF("doc_id", "text"), 3, path)
    val fired = SpanStore.compactIfNeeded(s, path, maxDeltaRatio = 0.5)
    assert(fired.nonEmpty)
    assert(!new java.io.File(s"$path/delta").exists())
  }
}
