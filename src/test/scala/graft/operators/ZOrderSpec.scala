package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Z-order layout: interleave correctness (vs the scalar reference and
  * the SQL twin generator) and the property the layout exists for —
  * bounded per-file ranges in BOTH dimensions, hence file skipping on
  * either predicate column. The value-level algebra is hash-verified
  * against DuckDB via q92 each round. */
class ZOrderSpec extends SparkTestBase {

  test("zValue column matches the scalar Morton reference") {
    val s = spark
    import s.implicits._
    // exhaustive 6-bit grid: all 4096 (x, y) pairs
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 6).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == ZOrder.zValueRef(x, y, 6), s"x=$x y=$y")
    }
    // z is a bijection on the 12-bit square
    assert(got.values.toSet.size == 4096)
    assert(got.values.min == 0L && got.values.max == 4095L)
  }

  test("zValueN: 2-D routes to the kernel; 3-D matches the scalar reference") {
    val s = spark
    import s.implicits._
    // 2-D arity must be EXACTLY the native kernel's curve
    val pairs = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val same = pairs.toDF("x", "y")
      .select((ZOrder.zValueN(Seq(col("x"), col("y")), 5) ===
        ZOrder.zValue(col("x"), col("y"), 5)).as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(same)
    // 3-D: random sample vs the independent scalar fold; bijection on
    // the full 3x3-bit cube
    val rnd = new scala.util.Random(5)
    val triples = Seq.fill(500)((rnd.nextInt(64).toLong,
      rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
    val got = triples.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 6).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ==
        ZOrder.zValueNRef(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 6))
    }
    val cube = for { x <- 0L until 8L; y <- 0L until 8L; w <- 0L until 8L } yield (x, y, w)
    val zs = cube.toDF("x", "y", "w")
      .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 3))
      .collect().map(_.getLong(0)).toSet
    assert(zs.size == 512 && zs.min == 0L && zs.max == 511L)
    // guard: the curve must fit a long
    intercept[IllegalArgumentException](
      ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 22))
  }

  test("writeZOrderedN bounds ALL THREE dims per file") {
    val s = spark
    import s.implicits._
    // exhaustive 5-bit cube: 32³ cells, 32 files ⇒ each file covers a
    // contiguous ~2^10-cell z-interval ⇒ low ~3 full bit-triples free
    // per axis (span ≤ 16), at most doubled by range-boundary slop
    val cube = (for { x <- 0L until 32L; y <- 0L until 32L; w <- 0L until 32L }
      yield (x, y, w)).toDF("x", "y", "w")
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    ZOrder.writeZOrderedN(cube, Seq("x", "y", "w"), bits = 5,
      numFiles = 32, path = dir)
    val spans = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"),
        (max(col("w")) - min(col("w"))).as("sw"))
      .collect()
    assert(spans.length >= 16)
    spans.foreach { r =>
      assert(r.getLong(1) <= 32 && r.getLong(2) <= 32 && r.getLong(3) <= 32,
        s"file spans ${r.getLong(1)}/${r.getLong(2)}/${r.getLong(3)} — not a 3-D tile")
    }
  }

  test("writeZOrdered bounds BOTH dims per file; a linear sort does not") {
    val s = spark
    import s.implicits._
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft-linear").toString
    ZOrder.writeZOrdered(grid, "x", "y", 6, 16, zDir)
    // the single-column layout every engine gets by default: sort by x
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(linDir)

    def fileBounds(dir: String): Seq[(Long, Long, Long, Long)] = {
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map { f =>
            val r = s.read.parquet(f.toString)
              .agg(min("x"), max("x"), min("y"), max("y")).head()
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
          }.toSeq
      } finally files.close()
    }
    val zB = fileBounds(zDir)
    val linB = fileBounds(linDir)
    assert(zB.size >= 8, s"expected a multi-file z layout, got ${zB.size}")

    // tile property: a 16-file split of the 4096-cell curve gives each
    // file ~a 16×16 tile; range-boundary sampling slop can at most
    // merge two adjacent tiles, never an axis-length stripe
    zB.foreach { case (x0, x1, y0, y1) =>
      assert(x1 - x0 <= 32 && y1 - y0 <= 32,
        s"z-file spans x[$x0,$x1] y[$y0,$y1] — not a tile")
    }
    // the linear layout cannot bound y: (nearly) every file spans the
    // whole y axis
    assert(linB.count { case (_, _, y0, y1) => y1 - y0 >= 48 } >= linB.size - 2)

    // the consequence: a y-only probe (y in [8, 15]) skips most z
    // files but no linear files
    def touching(b: Seq[(Long, Long, Long, Long)]): Int =
      b.count { case (_, _, y0, y1) => y0 <= 15 && y1 >= 8 }
    assert(touching(zB) * 2 <= zB.size,
      s"z layout should skip >= half the files on a y probe: ${touching(zB)}/${zB.size}")
    assert(touching(linB) == linB.size,
      "x-sorted layout cannot skip any file on a y probe")
  }

  test("zValueSql generates the identical interleave for the oracle") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, 9L), (0L, 0L), (255L, 255L), (170L, 85L)).toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val viaSql = s.sql(
        s"SELECT x, y, ${ZOrder.zValueSql("x", "y", 8)} AS z FROM zin")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    viaSql.foreach { case ((x, y), z) =>
      assert(z == ZOrder.zValueRef(x, y, 8), s"x=$x y=$y")
    }
  }
}
