package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfileStoreSpec extends SparkTestBase {

  test("incremental store round-trip equals the from-scratch probe") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different content about spark catalyst execution plans"
    val ref = Seq((10L, base), (11L, far)).toDF("doc_id", "text")
    val batch = Seq((12L, base.replace("quick", "quack"))).toDF("doc_id", "text")
    val stream = Seq((1L, near), (2L, "nothing shared here at all words"))
      .toDF("doc_id", "text")

    val path = java.nio.file.Files.createTempDirectory("pstore").toString
    ProfileStore.append(ref, path)
    ProfileStore.append(batch, path)

    val viaStore = ProfileStore.nearDupAgainstProfile(
        stream, ProfileStore.read(s, path), 3000L)
      .distinct().orderBy("doc_id", "ref_doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val scratch = TextDedup.nearDupAgainst(
        stream, ref.union(batch), 3000L)
      .distinct().orderBy("doc_id", "ref_doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaStore == scratch)
    assert(viaStore.nonEmpty && viaStore.forall(_._1 == 1L))
    // the stream doc matches both the base-append and the delta-append
    // reference docs — proof both generations of the store participate
    assert(viaStore.map(_._2).toSet == Set(10L, 12L))
  }

  test("a STREAM probes the stored profile (stream-static, append-safe)") {
    // the operational loop closed: profile persisted on disk, incoming
    // docs arrive as a STREAM, the probe is a stream-static join against
    // the read-back store — no stream-side aggregation, so append mode
    // holds and the store can keep growing between restarts
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val path = java.nio.file.Files.createTempDirectory("pstore-stream").toString
    ProfileStore.append(Seq((100L, base)).toDF("doc_id", "text"), path)
    ProfileStore.append(Seq(
      (200L, "completely different content about spark catalyst execution plans"))
      .toDF("doc_id", "text"), path)
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = ProfileStore.nearDupAgainstProfile(
      in.toDF().toDF("doc_id", "text"), ProfileStore.read(s, path), 3000L)
    val q = out.writeStream.format("memory").queryName("pstore_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, base.replace("today", "tomorrow")),
        (2L, "totally unrelated words about cooking pasta at home tonight"))
      q.processAllAvailable()
      val got = s.sql("SELECT DISTINCT doc_id, ref_doc_id FROM pstore_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 100L)))
    } finally q.stop()
  }

  test("append profiles only the delta's docs") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("pstore2").toString
    ProfileStore.append(Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"), path)
    val before = ProfileStore.read(s, path).count()
    ProfileStore.append(Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text"), path)
    val after = ProfileStore.read(s, path)
    assert(before == 1 && after.count() == 2)
    // profile rows carry the full verify payload
    assert(after.columns.toSet ==
      (Set("doc_id", "hs", "n") ++ (0 until 8).map(k => s"mh$k")))
    // a doc's profile row is identical whichever append wrote it
    val p1 = ProfileStore.profileOf(
      Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text"))
      .collect().head
    val p2 = after.filter(col("doc_id") === 2L).collect().head
    assert(p1.getAs[scala.collection.Seq[Long]]("hs").sorted ==
      p2.getAs[scala.collection.Seq[Long]]("hs").sorted &&
      p1.getAs[Long]("n") == p2.getAs[Long]("n") &&
      (0 until 8).forall(k => p1.getAs[Long](s"mh$k") == p2.getAs[Long](s"mh$k")))
  }
}
