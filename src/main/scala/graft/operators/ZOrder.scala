package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * tool for 100 TB lakes (Delta's OPTIMIZE ZORDER, Iceberg's sort-order
  * z-curve): interleaving the bits of two clustering keys and
  * range-sorting the write on the interleaved value bounds BOTH keys
  * within every file, so parquet row-group min/max stats prune scans on
  * EITHER predicate column — a single-column sort only ever prunes its
  * own column.
  *
  * The reference engine has no batch layout story (it is a CDC router);
  * this is part of the engine's declared lake surface: landed tables
  * (CdcPipeline.land) are query targets, and their re-cluster pass is
  * exactly `writeZOrdered`. All arithmetic is plain bit algebra on
  * longs — codegen-friendly, portable, and reproduced verbatim by the
  * DuckDB oracle twin (q92).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative long
    * columns: bit i of `x` lands at result bit 2i, bit i of `y` at
    * 2i+1. The native codegen kernel [[graft.functions.ZValue]] (one
    * tight loop in generated code; also registered in SQL as
    * `zvalue(x, y, bits)` via GraftExtensions). */
  def zValue(x: Column, y: Column, bits: Int): Column =
    graft.functions.ZValue.zvalue(x, y, bits)

  /** The same interleave as ANSI SQL over column expressions `x`/`y` —
    * the oracle-twin generator, bit-identical to [[zValue]]. */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
  }

  /** Scalar reference for the specs — deliberately an INDEPENDENT
    * formulation (decompose to bit seqs, weave, re-fold) so tests never
    * compare the codegen kernel against itself. */
  def zValueRef(x: Long, y: Long, bits: Int): Long = {
    val xb = (0 until bits).map(i => (x >> i) & 1L)
    val yb = (0 until bits).map(i => (y >> i) & 1L)
    xb.zip(yb).zipWithIndex.foldLeft(0L) { case (z, ((bx, by), i)) =>
      z + (bx << (2 * i)) + (by << (2 * i + 1))
    }
  }

  /** N-dimensional Morton interleave (round 9): bit i of dimension d
    * lands at result bit n·i+d — the general lakehouse clustering form
    * (Delta/Iceberg z-order over 3+ keys). Two dimensions route to the
    * native codegen kernel; higher arities expand to plain bit algebra
    * (n·bits shift/mask/add terms — whole-stage-codegen'd arithmetic,
    * no UDF). Requires n·bits ≤ 63 so the curve fits one long. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"zValueN needs >= 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a long: $n*$bits > 63")
    if (n == 2) zValue(cols(0), cols(1), bits)
    else cols.zipWithIndex.map { case (c, d) =>
      (0 until bits).map { i =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (n * i + d))
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** [[zValueN]] as ANSI SQL — the oracle-twin generator. */
  def zValueNSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    require(n >= 2 && bits >= 1 && n * bits <= 63)
    cols.zipWithIndex.flatMap { case (c, d) =>
      (0 until bits).map(i =>
        s"((($c >> $i) & 1) * ${1L << (n * i + d)})")
    }.mkString(" + ")
  }

  /** Scalar reference for the specs (independent formulation). */
  def zValueNRef(xs: Seq[Long], bits: Int): Long =
    xs.zipWithIndex.foldLeft(0L) { case (z, (x, d)) =>
      (0 until bits).foldLeft(z) { (acc, i) =>
        acc + (((x >> i) & 1L) << (xs.size * i + d))
      }
    }

  /** Re-cluster `df` on the z-curve of two long-typed columns and write
    * it as parquet: range-partition on the z-value (sampled range
    * boundaries — each output file covers a contiguous z-interval, i.e.
    * a bounded tile in BOTH dimensions), sort within partitions so
    * row groups inside each file are tiles too, then drop the transient
    * z column at write. `numFiles` sizes the output — at 100 TB pick
    * total/target-file-size; the range exchange is the one wide op. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, path: String): Unit =
    writeZOrderedN(df, Seq(xCol, yCol), bits, numFiles, path)

  /** [[writeZOrdered]] over N clustering columns. */
  def writeZOrderedN(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValueN(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
