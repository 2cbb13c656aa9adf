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

  /** Re-cluster `df` on the z-curve of two long-typed columns and write
    * it as parquet: range-partition on the z-value (sampled range
    * boundaries — each output file covers a contiguous z-interval, i.e.
    * a bounded tile in BOTH dimensions), sort within partitions so
    * row groups inside each file are tiles too, then drop the transient
    * z column at write. `numFiles` sizes the output — at 100 TB pick
    * total/target-file-size; the range exchange is the one wide op. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
