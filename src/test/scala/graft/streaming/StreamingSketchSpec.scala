package graft.streaming

import graft.SparkTestBase
import graft.operators.QuantileSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamingSketch: the continuously-maintained bottom-k sketch must be
  * BIT-EQUAL to the batch QuantileSketch over the same rows, for any
  * batching and arrival order — the merge law made operational. */
class StreamingSketchSpec extends SparkTestBase {
  import StreamingSketch._

  private val rows: Seq[SkIn] =
    (1 to 400).map(i => SkIn(if (i % 3 == 0) "a" else "b",
      (i.toLong * 37) % 500, s"key-$i"))

  test("stream sketch equals the batch sketch under shuffled multi-batch arrival") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[SkIn]
    val q = StreamingSketch.bottomK(s, in.toDS(), k = 32)
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("ssk").start()
    // three shuffled batches, one row duplicated across batches
    val shuffled = new scala.util.Random(7).shuffle(rows)
    val (b1, rest) = shuffled.splitAt(140)
    val (b2, b3) = rest.splitAt(130)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2 :+ b1.head: _*); q.processAllAvailable()
    in.addData(b3: _*); q.processAllAvailable()
    q.stop()
    // "the sketch now" = max-upd row per group
    val latest = spark.table("ssk")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"upd".desc)))
      .filter($"rn" === 1)
      .select($"g", $"vals")
      .as[(String, Seq[Long])].collect().toMap
    // batch ground truth over the LOGICAL row set: the cross-batch
    // replay of b1.head models at-least-once delivery, and idempotence
    // means the streamed sketch equals the batch sketch of the input
    // WITHOUT the replay
    val batch = QuantileSketch.bottomK(
        rows.toDF("g", "value", "key"), "g", "value", "key", 32)
      .groupBy($"g").agg(sort_array(collect_list($"value")).as("vals"))
      .as[(String, Seq[Long])].collect().toMap
    assert(latest.keySet === batch.keySet)
    for (g <- batch.keySet) assert(latest(g) === batch(g), s"group $g")
  }

  test("estimates from the streamed sketch match the batch estimates") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[SkIn]
    val q = StreamingSketch.bottomK(s, in.toDS(), k = 64)
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("ssk2").start()
    in.addData(rows: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssk2")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"upd".desc)))
      .filter($"rn" === 1)
      .select($"g",
        element_at($"vals", ceil(lit(0.5) * $"n_kept").cast("int")).as("p50"))
      .as[(String, Long)].collect().toMap
    val batch = QuantileSketch.estimates(
        QuantileSketch.bottomK(rows.toDF("g", "value", "key"),
          "g", "value", "key", 64),
        "g", Seq("p50" -> 0.5))
      .select($"g", $"p50").as[(String, Long)].collect().toMap
    assert(streamed === batch)
  }
}
