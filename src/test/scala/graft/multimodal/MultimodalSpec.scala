package graft.multimodal

import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("binary attach + decode is partition-preserving and deterministic") {
    val docs = Tables.documents(spark, sf001)
    val media = Multimodal.attachBinary(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.decodeFeatures(spark, media)
    // no shuffle: decode is a narrow map over the scan partitions
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode stage must not shuffle:\n$plan")
    val row = feats.filter(col("doc_id") === 0).collect().head
    val text = docs.filter(col("doc_id") === 0).collect().head.getAs[String]("text")
    assert(row.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
    assert(row.getAs[Long]("first_byte") == (text.head & 0xff).toLong)
    // run twice → identical (stub decoder is deterministic)
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeFeatures(spark, media).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("frameFeatures splits the binary into 64-byte frames with exact sums") {
    val s = spark
    import s.implicits._
    val payload = ("ab" * 65) // 130 bytes -> frames of 64, 64, 2
    val media = Seq((7L, payload)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        lit("text").as("kind"))
    val frames = Multimodal.frameFeatures(spark, media)
      .orderBy("frame_idx").collect()
    assert(frames.length == 3)
    val bytes = payload.getBytes("UTF-8").map(_ & 0xff)
    def sumRange(from: Int, until: Int) =
      bytes.slice(from, until).foldLeft(0L)((a, b) => (a + b) % 1000000007L)
    assert(frames.map(_.getAs[Long]("fsum")).toSeq ==
      Seq(sumRange(0, 64), sumRange(64, 128), sumRange(128, 130)))
    // no shuffle: frame explode is a narrow flatMap
    val plan = Multimodal.frameFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame stage must not shuffle:\n$plan")
  }
}
