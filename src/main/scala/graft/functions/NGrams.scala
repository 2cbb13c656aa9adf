package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Word n-gram generator — the custom UDTF surface (SURVEY.md B31): a
  * Catalyst `Generator` that explodes a token array into its n-grams in
  * one pass, instead of the sequence+transform+explode three-step. Each
  * output row is the space-joined n-gram (the shingle form used by the
  * dedup suite).
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)
  override def position: Boolean = false
  override def inline: Boolean = false

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val toks = (0 until arr.numElements()).map(i => arr.getUTF8String(i))
      (0 to toks.size - n).iterator.map { i =>
        val joined = toks.slice(i, i + n).map(_.toString).mkString(" ")
        InternalRow(UTF8String.fromString(joined))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {
  /** usage: df.select(ngrams(col("tokens"), 3).as("ngram")) */
  def ngrams(tokens: Column, n: Int): Column =
    Bridge.column(NGrams(Bridge.expression(tokens), n))
}
