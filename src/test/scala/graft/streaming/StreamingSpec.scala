package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** True Structured Streaming semantics (SURVEY.md B25–B27): watermark
  * late-drop, session windows, dropDuplicatesWithinWatermark — driven by
  * MemoryStream with out-of-order input (the cdc_outoforder fixture shape). */
class StreamingSpec extends SparkTestBase {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("B25: tumbling window with watermark drops too-late rows") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("b25").start()

    in.addData((ts(5), "click"), (ts(10), "click"))
    q.processAllAvailable()
    // advance event time far ahead: watermark passes 10:59
    in.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "click"))
    q.processAllAvailable()
    // this row is now > 10 min behind the watermark → dropped
    in.addData((ts(1), "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("b25")
      .filter(col("window.start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .select(max("n")).collect()
    assert(rows.head.getLong(0) == 2, "late row must not increment the 10:00 window")
  }

  test("B26: session_window groups events within 30-minute gaps") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("b26").start()
    // user 1: 10:00,10:20,10:40 = one session; 11:30 = new session
    in.addData((ts(0), 1L), (ts(20), 1L), (ts(40), 1L),
      (Timestamp.valueOf("2024-01-01 11:30:00"), 1L))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("b26").filter(col("user_id") === 1)
      .select(col("n")).collect().map(_.getLong(0)).sorted
    assert(sessions.toSeq == Seq(1L, 3L))
  }

  test("stream-stream interval join: purchases matched to prior clicks within 30 min") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "10 minutes")
    // interval condition bounds state retention on both sides — the
    // watermark can expire click state once b_ts range has passed.
    val joined = b.join(c,
      col("b_user") === col("c_user") &&
        col("c_ts") <= col("b_ts") &&
        col("c_ts") >= col("b_ts") - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    clicks.addData((ts(0), 1L), (ts(5), 2L), (ts(10), 1L))
    buys.addData((ts(20), 1L), (ts(50), 2L)) // user2 buys 45min after click: no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj")
      .select(col("b_user"), col("c_ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    // user1's purchase at 10:20 matches BOTH clicks (10:00, 10:10); user2's none
    assert(rows.toSet === Set((1L, ts(0)), (1L, ts(10))))
  }

  test("custom state: flatMapGroupsWithState sessionizer emits closed sessions") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[StatefulOps.Event]
    val sessions = StatefulOps.sessionize(
      spark, in.toDS(), gapMs = 30L * 60 * 1000, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("fmgws").start()
    // user 1: 10:00,10:20 (one session), then 11:30 (new session)
    in.addData(StatefulOps.Event(1L, ts(0)), StatefulOps.Event(1L, ts(20)))
    q.processAllAvailable()
    in.addData(StatefulOps.Event(1L, Timestamp.valueOf("2024-01-01 11:30:00")))
    q.processAllAvailable()
    // advance the watermark far enough to time out the open session
    in.addData(StatefulOps.Event(9L, Timestamp.valueOf("2024-01-01 14:00:00")))
    q.processAllAvailable()
    in.addData(StatefulOps.Event(9L, Timestamp.valueOf("2024-01-01 16:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fmgws").filter(col("user_id") === 1L)
      .select("start", "end", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got.contains((ts(0), ts(20), 2L)), s"first session must close on gap: $got")
    assert(got.contains((Timestamp.valueOf("2024-01-01 11:30:00"),
      Timestamp.valueOf("2024-01-01 11:30:00"), 1L)),
      s"second session must close on event-time timeout: $got")
  }

  test("transformWithState sessionizer matches flatMapGroupsWithState exactly") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StatefulOps.Event]
      val sessions = StatefulOps.sessionizeTws(
        spark, in.toDS(), gapMs = 30L * 60 * 1000, watermarkDelay = "10 minutes")
      val q = sessions.writeStream.outputMode("append")
        .format("memory").queryName("tws").start()
      in.addData(StatefulOps.Event(1L, ts(0)), StatefulOps.Event(1L, ts(20)))
      q.processAllAvailable()
      in.addData(StatefulOps.Event(1L, Timestamp.valueOf("2024-01-01 11:30:00")))
      q.processAllAvailable()
      in.addData(StatefulOps.Event(9L, Timestamp.valueOf("2024-01-01 14:00:00")))
      q.processAllAvailable()
      in.addData(StatefulOps.Event(9L, Timestamp.valueOf("2024-01-01 16:00:00")))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("tws").filter(col("user_id") === 1L)
        .select("start", "end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
      // identical sessions to the flatMapGroupsWithState form's contract
      assert(got.contains((ts(0), ts(20), 2L)), s"gap close: $got")
      assert(got.contains((Timestamp.valueOf("2024-01-01 11:30:00"),
        Timestamp.valueOf("2024-01-01 11:30:00"), 1L)), s"timer close: $got")
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionizers: a late admissible event bridges pending intervals (no overlap rows)") {
    // r4 advisory scenario: 10:00 and 10:50 arrive in separate batches
    // (gap 30 min apart > 50 min — two pending intervals), then a LATE
    // but admissible 10:20 arrives and bridges them. Emitting tail
    // intervals eagerly would have already surfaced [10:00,10:00]; the
    // emit-on-watermark contract must yield exactly ONE merged session.
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    type Mk = (org.apache.spark.sql.SparkSession, org.apache.spark.sql.Dataset[StatefulOps.Event]) => org.apache.spark.sql.Dataset[StatefulOps.ClosedSession]
    val variants: Seq[(String, Mk)] = Seq(
      "fmgws_bridge" -> ((sp, ds) => StatefulOps.sessionize(sp, ds, 30L * 60 * 1000, "40 minutes")),
      "tws_bridge" -> ((sp, ds) => StatefulOps.sessionizeTws(sp, ds, 30L * 60 * 1000, "40 minutes")))
    for ((name, mk) <- variants) {
      val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      if (name.startsWith("tws"))
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val in = MemoryStream[StatefulOps.Event]
        val q = mk(spark, in.toDS()).writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        in.addData(StatefulOps.Event(1L, ts(0)))          // 10:00
        q.processAllAvailable()
        in.addData(StatefulOps.Event(1L, ts(50)))         // 10:50 — separate interval
        q.processAllAvailable()
        in.addData(StatefulOps.Event(1L, ts(20)))         // LATE 10:20 — bridges
        q.processAllAvailable()
        // push the watermark far past every deadline to flush
        in.addData(StatefulOps.Event(9L, Timestamp.valueOf("2024-01-01 15:00:00")))
        q.processAllAvailable()
        in.addData(StatefulOps.Event(9L, Timestamp.valueOf("2024-01-01 17:00:00")))
        q.processAllAvailable()
        q.stop()
        val got = spark.table(name).filter(col("user_id") === 1L)
          .select("start", "end", "n_events").collect()
          .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSeq
        assert(got == Seq((ts(0), ts(50), 3L)),
          s"$name: bridged session must be the ONLY row, got $got")
      } finally {
        prevProvider match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
  }

  test("B27: dropDuplicatesWithinWatermark dedups replayed event ids") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val dedup = in.toDF().toDF("ts", "event_id", "v")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("b27").start()
    in.addData((ts(0), 1L, "a"), (ts(1), 2L, "b"))
    q.processAllAvailable()
    in.addData((ts(2), 1L, "a-replay"), (ts(3), 3L, "c"))
    q.processAllAvailable()
    // flush append-mode results past the watermark
    in.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 99L, "z"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("b27").select("event_id").collect().map(_.getLong(0))
    assert(ids.count(_ == 1L) == 1, "replayed event_id=1 must be deduped")
    assert(ids.toSet.intersect(Set(1L, 2L, 3L)) == Set(1L, 2L, 3L))
  }

  test("streaming ingest pipeline: decontaminate -> near-dup check -> split sink") {
    // The round-8 streaming composition: an incoming doc stream passes
    // the Bloom decontamination gate, is near-dup-checked against the
    // reference corpus, and clean novel docs land in a split-
    // partitioned parquet sink — all append-mode, no state.
    val s = spark
    import s.implicits._
    val P = 1000000007L
    val evalSet = Seq((900L, "the forbidden eval sentence that no training doc may contain"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (800L, "a well known reference document that lives in the training set already"))
      .toDF("doc_id", "text")
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val (flagged, handle) = graft.operators.SketchFilter.decontaminateStream(
      stream, "text", evalSet, "text", 5, 1000L)
    val outDir = java.nio.file.Files.createTempDirectory("ingest-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString
    // the near-dup drop runs per micro-batch inside foreachBatch (the
    // production shape — an anti join between two branches of the same
    // stream isn't expressible in append mode)
    val q = flagged.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dups = graft.operators.TextDedup.nearDupAgainst(
            batch.filter(!col("contaminated")), corpus, 3000L)
          .select(col("doc_id")).dropDuplicates("doc_id")
        batch.filter(!col("contaminated"))
          .join(dups, Seq("doc_id"), "left_anti")
          .withColumn("split",
            when((((col("doc_id") % P) * 40503L + 17L) % P) % 1000L < 800L, "train")
              .otherwise("holdout"))
          .write.mode("append").partitionBy("split").parquet(outDir)
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(
        (1L, "a fresh clean training document with entirely new original words"),
        (2L, "contains the forbidden eval sentence that no training doc may contain plus extra"),
        (3L, "a well known reference document that lives in the training set already today"))
      q.processAllAvailable()
      val landed = s.read.parquet(outDir).select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // doc 2 is contaminated (eval span), doc 3 near-dups the corpus;
      // only doc 1 lands, with a deterministic split
      assert(landed.keySet === Set(1L), s"landed: $landed")
      assert(Set("train", "holdout").contains(landed(1L)))
    } finally {
      q.stop()
      handle.destroy()
    }
  }
}
