package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md B31): `Aggregator[IN, BUF, OUT]` with
  * map-side partial aggregation (reduce) + merge — the same two-phase
  * shape Spark's built-in aggregates use, so it scales like them. */
object Aggregators {

  /** Exact sum of squares over integral-valued doubles (quantities are
    * whole numbers, so long arithmetic is exact and oracle-comparable). */
  object SumSq extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long = {
      val v = a.toLong
      b + v * v
    }
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
