package graft.streaming

import graft.SparkTestBase
import graft.operators.{ClusterStore, GraphDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** StreamingClusters: the continuously-maintained cluster store must
  * equal from-scratch connected components over every pair that ever
  * arrived, under any batching, WITH replays (at-least-once delivery),
  * and across a query restart — the q151 store+delta law made
  * continuous. */
class StreamingClustersSpec extends SparkTestBase {
  import StreamingClusters._

  private def labelsOf(path: String): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ClusterStore.read(s, path).as[(Long, Long)].collect().toMap
  }

  private def scratch(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphDedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("streamed pairs land the from-scratch clustering, replays included") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-sclu").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sclu-ck").toString
    val in = MemoryStream[(Long, Long)]
    val q = maintain(in.toDF().toDF("d1", "d2"), "d1", "d2", path, ckpt)
    val b1 = Seq((1L, 2L), (5L, 6L), (9L, 10L))
    val b2 = Seq((2L, 5L), (20L, 21L))
    val b3 = Seq((6L, 9L), (2L, 5L), (1L, 2L)) // replays ride along
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    // a whole replayed batch (at-least-once source), then fresh merges
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(b3: _*); q.processAllAvailable()
    q.stop()
    val want = scratch(b1 ++ b2 ++ b3)
    assert(labelsOf(path) === want)
    Seq(1L, 2L, 5L, 6L, 9L, 10L).foreach(v => assert(labelsOf(path)(v) === 1L))
  }

  test("a restarted query continues the same store") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-sclu2").toString
    val ck1 = java.nio.file.Files.createTempDirectory("graft-sclu2-ck").toString
    val in1 = MemoryStream[(Long, Long)]
    val q1 = maintain(in1.toDF().toDF("d1", "d2"), "d1", "d2", path, ck1)
    in1.addData((1L, 2L), (7L, 8L)); q1.processAllAvailable()
    q1.stop()
    // "restart": a new query over a new source, same store
    val ck2 = java.nio.file.Files.createTempDirectory("graft-sclu2-ck2").toString
    val in2 = MemoryStream[(Long, Long)]
    val q2 = maintain(in2.toDF().toDF("d1", "d2"), "d1", "d2", path, ck2)
    in2.addData((2L, 7L), (100L, 101L)); q2.processAllAvailable()
    q2.stop()
    assert(labelsOf(path) ===
      scratch(Seq((1L, 2L), (7L, 8L), (2L, 7L), (100L, 101L))))
  }

  test("compaction threshold riding the stream changes nothing observable") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-sclu3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sclu3-ck").toString
    val in = MemoryStream[(Long, Long)]
    // maxRemap = 0: every batch that merges anything compacts after
    val q = maintain(in.toDF().toDF("d1", "d2"), "d1", "d2", path, ckpt,
      maxRemap = 0)
    in.addData((1L, 2L), (5L, 6L)); q.processAllAvailable()
    in.addData((2L, 5L)); q.processAllAvailable()
    in.addData((6L, 50L)); q.processAllAvailable()
    q.stop()
    assert(labelsOf(path) ===
      scratch(Seq((1L, 2L), (5L, 6L), (2L, 5L), (6L, 50L))))
  }
}
