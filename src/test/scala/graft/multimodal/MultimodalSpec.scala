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
}
