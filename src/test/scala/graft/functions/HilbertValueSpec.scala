package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** HilbertValue (q148): bijectivity, the UNIT-STEP invariant that
  * defines a Hilbert curve (and that Morton order lacks), kernel ≡
  * codegen path, and the measured locality win over Z-order. */
class HilbertValueSpec extends SparkTestBase {
  import spark.implicits._

  test("hilbert index is a bijection on the 16x16 grid") {
    val ds = (0 until 256).map(i => (i.toLong % 16, i.toLong / 16))
      .map { case (x, y) => HilbertValue.xy2d(x, y, 4) }
    assert(ds.sorted === (0L until 256L))
  }

  test("consecutive hilbert indices are grid-adjacent (unit steps) — Morton is not") {
    // THE Hilbert property: walking d = 0..n²-1 moves exactly one cell
    // at a time. Exhaustive on the 32x32 grid.
    val bits = 5
    val n = 1 << bits
    val byD = new Array[(Long, Long)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      byD(HilbertValue.xy2d(x, y, bits).toInt) = (x.toLong, y.toLong)
    val steps = byD.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(steps.forall(_ == 1L), "every Hilbert step must be unit length")
    // Morton on the same grid has seam jumps (max step >> 1)
    val byZ = new Array[(Long, Long)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      byZ(ZValue.interleave(x, y, bits).toInt) = (x.toLong, y.toLong)
    val zMax = byZ.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(zMax > 1L, "Morton must show seam jumps on this grid")
  }

  test("codegen expression equals the kernel on random coordinates") {
    val pts = (0 until 500).map { i =>
      (((i * 7919) % 256).toLong, ((i * 104729 + 13) % 256).toLong)
    }
    val got = pts.toDF("x", "y")
      .select(HilbertValue.hilbert($"x", $"y", 8).as("h"))
      .as[Long].collect().toSeq
    assert(got === pts.map { case (x, y) => HilbertValue.xy2d(x, y, 8) })
  }

  test("hilbert beats z-order on range-scan locality (measured)") {
    // The clustering metric that matters for a layout (Moon et al.
    // 2001): the number of maximal CONTIGUOUS index runs a query
    // rectangle decomposes into — each run is one range scan / one
    // contiguous file stretch. Hilbert provably minimizes expected
    // runs; Morton pays extra seam crossings. Summed over query
    // rectangles on the 256×256 grid.
    val rects = Seq((10, 10, 40, 40), (100, 50, 60, 20), (200, 200, 30, 50),
      (0, 128, 128, 16), (77, 3, 25, 90))
    def runs(f: (Long, Long) => Long): Int = rects.map {
      case (x0, y0, w, h) =>
        val ds = (for (x <- x0 until x0 + w; y <- y0 until y0 + h)
          yield f(x.toLong, y.toLong)).sorted
        1 + ds.sliding(2).count { case Seq(a, b) => b != a + 1 }
    }.sum
    val hRuns = runs(HilbertValue.xy2d(_, _, 8))
    val zRuns = runs(ZValue.interleave(_, _, 8))
    assert(hRuns < zRuns,
      s"hilbert runs $hRuns must beat morton runs $zRuns")
  }
}
