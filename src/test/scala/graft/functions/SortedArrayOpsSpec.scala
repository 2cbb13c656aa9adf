package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.SortedArrayOps.sortedIntersectCount

/** The two-pointer kernel must equal size(array_intersect(a, b)) on
  * every sorted duplicate-free input — that identity is what keeps the
  * triangle count (and any future adjacency-array consumer) exact. */
class SortedArrayOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("sortedIntersectCount equals size(array_intersect) on sorted sets") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      def set() = Array.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong)
        .distinct.sorted
      (set(), set())
    } ++ Seq(
      (Array.empty[Long], Array(1L, 2L)),          // empty left
      (Array(1L, 2L, 3L), Array.empty[Long]),      // empty right
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),      // identical
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),      // disjoint interleaved
      (Array(Long.MinValue, 0L, Long.MaxValue),
        Array(Long.MinValue, Long.MaxValue)))      // extremes
    val df = rows.toDF("a", "b")
    val out = df.select(
      sortedIntersectCount(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("s"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("sortedIntersectCount propagates null arrays like array_intersect") {
    val df = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (None: Option[Array[Long]], Some(Array(1L))),
      (Some(Array(1L, 2L)), Some(Array(2L, 3L))))
      .toDF("a", "b")
    val got = df.select(sortedIntersectCount(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(None, None, Some(1L)))
  }
}
