package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-prefiltered joins — the 100 TB shape of "does this key exist
  * on the other side": build a mergeable Bloom sketch over the build
  * side's keys (one aggregation, map-side combined), ship the sketch to
  * every probe task, and drop probe rows that CANNOT match before any
  * probe-side shuffle. The exact join still runs after the prefilter,
  * so false positives are eliminated and the result is IDENTICAL to the
  * plain join — only the shuffled probe volume changes (by the
  * miss rate; a decontamination scan where ~1% of eval spans hit train
  * ships ~1% of the rows it used to).
  *
  * Built on Spark's own sketch machinery: `BloomFilterAggregate` (the
  * aggregate behind AQE's runtime row-level filtering) and the codegen
  * `BloomFilterMightContain` predicate — not a UDF, so the probe-side
  * check fuses into whole-stage codegen. The sketch travels as a
  * literal in the plan (same physics as a broadcast dim, sized by
  * `fpp`, e.g. ~1.2 MB for 1M keys at 1% fpp).
  */
object SketchFilter {

  /** Left-semi join with a Bloom prefilter on the probe (left) side.
    * Result is bit-identical to `left SEMI JOIN right` on the keys —
    * the sketch admits no false negatives and the exact join removes
    * its false positives. Keys must be BIGINT (the aggregate's input
    * contract; hash wider keys first). */
  def bloomSemi(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(col(rightKey)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val sketch = right.select(Bridge.column(agg)).head().getAs[Array[Byte]](0)
    if (sketch == null) return left.limit(0) // empty build side: empty semi join
    val pre = left.filter(Bridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType), Bridge.expression(col(leftKey)))))
    pre.join(right, col(leftKey) === col(rightKey), "leftsemi")
  }
}
