package graft.streaming

import java.nio.file.Files
import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** VERDICT r3 item 8: the streaming twins run over the REAL sf0.01
  * events fixture through the FILE source (schema-declared parquet
  * stream, checkpointed, Trigger.AvailableNow) and must equal the
  * oracled batch results — not just MemoryStream toys.
  *
  * The fixture copy is written sorted by event_id so arrival order is
  * deterministic (first-arrival dedup ≡ min(event_id) per key), making
  * stream/batch equality exact rather than modulo arrival races.
  */
class StreamFixtureSpec extends SparkTestBase {

  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("events-stream-src").toString
    Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
      .coalesce(1).sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Schema-declared parquet file stream over the fixture copy, with
    * the same ts_t event-time column the batch twins use. */
  private def eventStream(): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
      .withColumn("ts_t", timestamp_micros((col("ts") / 1000L).cast("long")))

  private def runToMemory(df: DataFrame, name: String,
      outputMode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation",
        Files.createTempDirectory(s"ckpt-$name").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("q25 tumbling window: file-source stream equals the oracled batch result") {
    val streamed = runToMemory(
      eventStream()
        .withWatermark("ts_t", "1 hour")
        .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      "sfx_q25", "complete")
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf001)
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q26 session windows: file-source session_window equals the batch gap sessions") {
    val streamed = runToMemory(
      eventStream()
        .withWatermark("ts_t", "1 hour")
        .groupBy(session_window(col("ts_t"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ns")),
      "sfx_q26", "complete")
      .select(col("user_id"), col("start_ns"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch gap-merge twin (the q26 formulation, keyed on raw ns)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapNs = 30L * 60L * 1000000000L
    val batch = Tables.events(spark, sf001)
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w1) > gapNs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w1.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ns"))
      .select(col("user_id"), col("start_ns"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // session_window works at microsecond precision (ts_t) while the
    // batch twin merges on raw nanos — identical sessions because gap
    // comparisons in this fixture are far from the sub-microsecond edge;
    // compare starts at microsecond granularity.
    val streamedUs = streamed.map { case (u, ns, n) => (u, ns / 1000, n) }
    val batchUs = batch.map { case (u, ns, n) => (u, ns / 1000, n) }
    assert(streamedUs == batchUs)
    assert(streamedUs.nonEmpty)
  }

  test("q27 dedup: first-arrival dropDuplicatesWithinWatermark equals batch min(event_id)") {
    val streamed = runToMemory(
      eventStream()
        .withWatermark("ts_t", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "ts"),
      "sfx_q27", "append")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Tables.events(spark, sf001)
      .groupBy(col("user_id"), col("event_type"), col("ts"))
      .agg(min(col("event_id")).as("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q61 interval join: stream-stream join matches the batch click counts") {
    val purchases = eventStream().filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("p_event"),
        col("ts").as("pts"), col("ts_t").as("pts_t"))
      .withWatermark("pts_t", "2 hours")
    val clicks = eventStream().filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("ts_t").as("cts_t"))
      .withWatermark("cts_t", "2 hours")
    val gapNs = 30L * 60L * 1000000000L
    val joined = runToMemory(
      purchases.join(clicks,
        col("pu") === col("cu") &&
          col("cts") >= col("pts") - lit(gapNs) && col("cts") < col("pts") &&
          col("cts_t") >= col("pts_t") - expr("INTERVAL 30 MINUTES") &&
          col("cts_t") <= col("pts_t")),
      "sfx_q61", "append")
    val streamedCounts = joined.groupBy(col("pu"), col("p_event"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.SparkEntry.queries("q61_interval_join")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // batch is a LEFT join (zero-click purchases included); the stream
    // inner join must agree on every purchase with >= 1 click and must
    // produce nothing for the zero-click ones.
    assert(batch.nonEmpty)
    val expectedNonZero = batch.filter(_._2 > 0)
    assert(streamedCounts == expectedNonZero)
  }

  test("multimodal decode is streaming-safe: streamed q79 equals the batch result") {
    // the media path is a narrow synthesize→decode→feature map, so it
    // must run unchanged as an append-mode stream over a file source —
    // the 100 TB ingest shape (binary columns arriving continuously)
    val docsDir = Files.createTempDirectory("docs-stream-src").toString
    Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .coalesce(1).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(docsDir)
    val docStream = spark.readStream
      .schema(spark.read.parquet(docsDir).schema)
      .parquet(docsDir)
    val streamed = runToMemory(
      graft.multimodal.AudioVideo.audioFeatures(spark,
        graft.multimodal.AudioVideo.attachAudio(spark, docStream)),
      "sfx_q79", "append")
      .collect().map(_.toSeq).toSet
    val batch = graft.SparkEntry.queries("q79_audio_features")(spark, sf001)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed == batch)
  }
}
