package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** ClusterStore: the incremental near-dup clustering must be BIT-EQUAL
  * to from-scratch connected components over the union of all pair
  * batches, for any batch split — the union-of-quotients law (labels
  * are min-reachable ids, so contracting each batch's clusters to
  * their labels preserves the global quotient). Also pins the
  * remap-composition path (a merge-of-merges across three deltas) and
  * compaction transparency. */
class ClusterStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-clusterstore").toString

  private def labelsOf(path: String): Map[Long, Long] =
    ClusterStore.read(spark, path)
      .as[(Long, Long)].collect().toMap

  private def scratch(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    GraphDedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("build + one delta equals from-scratch CC over the union") {
    val hist = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val delta = Seq((3L, 10L), (30L, 31L), (21L, 20L)) // merge, new, dup
    val path = freshPath()
    ClusterStore.build(hist.toDF("d1", "d2"), "d1", "d2", path)
    ClusterStore.applyDelta(spark, path, delta.toDF("d1", "d2"), "d1", "d2")
    assert(labelsOf(path) === scratch(hist ++ delta))
  }

  test("three chained deltas with cross-delta merges (remap composition)") {
    val b0 = Seq((1L, 2L), (5L, 6L), (9L, 10L))
    val d1 = Seq((2L, 5L)) // merges {1,2} with {5,6} -> label 1
    val d2 = Seq((6L, 9L)) // merges the merged cluster with {9,10}
    val d3 = Seq((100L, 9L), (200L, 201L)) // history touch + fresh
    val path = freshPath()
    ClusterStore.build(b0.toDF("d1", "d2"), "d1", "d2", path)
    Seq(d1, d2, d3).foreach(d =>
      ClusterStore.applyDelta(spark, path, d.toDF("d1", "d2"), "d1", "d2"))
    assert(labelsOf(path) === scratch(b0 ++ d1 ++ d2 ++ d3))
    // every member of the fused cluster carries the global min id
    val got = labelsOf(path)
    Seq(1L, 2L, 5L, 6L, 9L, 10L, 100L).foreach(v => assert(got(v) === 1L))
  }

  test("randomized splits: any partition of the pair stream lands the same clustering") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val want = scratch(pairs)
    for (seed <- 1 to 3) {
      val r2 = new scala.util.Random(seed)
      val shuffled = r2.shuffle(pairs)
      val (a, rest) = shuffled.splitAt(40)
      val (b, c) = rest.splitAt(40)
      val path = freshPath()
      ClusterStore.build(a.toDF("d1", "d2"), "d1", "d2", path)
      ClusterStore.applyDelta(spark, path, b.toDF("d1", "d2"), "d1", "d2")
      ClusterStore.applyDelta(spark, path, c.toDF("d1", "d2"), "d1", "d2")
      assert(labelsOf(path) === want, s"seed=$seed")
    }
  }

  test("compaction folds the remap and changes nothing observable") {
    val b0 = Seq((1L, 2L), (5L, 6L), (9L, 10L))
    val d1 = Seq((2L, 5L), (6L, 9L))
    val path = freshPath()
    ClusterStore.build(b0.toDF("d1", "d2"), "d1", "d2", path)
    ClusterStore.applyDelta(spark, path, d1.toDF("d1", "d2"), "d1", "d2")
    val before = labelsOf(path)
    assert(ClusterStore.compactIfNeeded(spark, path, maxRemap = 0))
    assert(labelsOf(path) === before)
    // under the threshold: a no-op
    assert(!ClusterStore.compactIfNeeded(spark, path, maxRemap = 10))
    // and deltas keep applying after a compaction
    ClusterStore.applyDelta(spark, path,
      Seq((10L, 50L)).toDF("d1", "d2"), "d1", "d2")
    assert(labelsOf(path) === scratch(b0 ++ d1 ++ Seq((10L, 50L))))
  }

  test("remap grows with MERGES, not ingest: new-vertex-only deltas leave it empty") {
    // review fix: a fresh pair (7,8) contracts 8->7, but no base row
    // ever carries component 8 (new vertices append at final labels) —
    // persisting that entry would grow the remap with every ingested
    // batch and trigger needless full-base compactions
    val path = freshPath()
    ClusterStore.build(Seq((1L, 2L)).toDF("d1", "d2"), "d1", "d2", path)
    ClusterStore.applyDelta(spark, path,
      Seq((7L, 8L), (20L, 21L), (21L, 22L)).toDF("d1", "d2"), "d1", "d2")
    // labels correct AND the remap stayed empty (compactIfNeeded with
    // maxRemap=0 returns false exactly when there is nothing to fold)
    assert(labelsOf(path) === scratch(Seq((1L, 2L), (7L, 8L), (20L, 21L), (21L, 22L))))
    assert(!ClusterStore.compactIfNeeded(spark, path, maxRemap = 0),
      "remap must be empty after a new-vertex-only delta")
    // a HISTORY-touching merge still persists exactly its entries
    ClusterStore.applyDelta(spark, path,
      Seq((2L, 7L)).toDF("d1", "d2"), "d1", "d2")
    assert(labelsOf(path) ===
      scratch(Seq((1L, 2L), (7L, 8L), (20L, 21L), (21L, 22L), (2L, 7L))))
  }

  test("delta with no merges (disjoint new clusters) and duplicate replayed pairs") {
    val b0 = Seq((1L, 2L))
    val path = freshPath()
    ClusterStore.build(b0.toDF("d1", "d2"), "d1", "d2", path)
    // replay of (1,2) plus a disjoint pair, twice over
    val d = Seq((1L, 2L), (7L, 8L), (8L, 7L))
    ClusterStore.applyDelta(spark, path, d.toDF("d1", "d2"), "d1", "d2")
    assert(labelsOf(path) === scratch(b0 ++ d))
  }
}
