package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming funnel (StatefulOps.funnelStages): exact batch-parity
  * semantics under out-of-order arrival — the stage vector only ever
  * advances on events the WATERMARK has finalized, applied in event-time
  * order, so arrival order across micro-batches cannot change the answer
  * the batch operator (q114) would give. */
class StreamingFunnelSpec extends SparkTestBase {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private val Stages = Seq("view", "click", "purchase")
  private def ev(u: Long, m: Int, t: String) = StatefulOps.TypedEvent(u, ts(m), t)

  private def run(name: String)(feed: MemoryStream[StatefulOps.TypedEvent]
      => Unit): Map[(Long, Int), Timestamp] = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[StatefulOps.TypedEvent]
    val q = StatefulOps.funnelStages(s, in.toDS(), Stages, "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      feed(in)
      // push the watermark far past every fixture event so all buffers drain
      in.addData(StatefulOps.TypedEvent(99L,
        Timestamp.valueOf("2024-01-01 18:00:00"), "error"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("user_id") =!= 99L)
      .select("user_id", "stage", "at").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getTimestamp(2)).toMap
  }

  test("in-order full funnel emits each stage once, at its event time") {
    val got = run("sf1") { in =>
      in.addData(ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 9, "purchase"))
    }
    assert(got === Map((1L, 0) -> ts(0), (1L, 1) -> ts(5), (1L, 2) -> ts(9)))
  }

  test("late-but-admissible early view still claims stage 0 (batch parity)") {
    val got = run("sf2") { in =>
      // click arrives FIRST (arrival order), but its ts is AFTER the view
      in.addData(ev(2, 8, "click"))
      // view arrives in a later micro-batch with an EARLIER ts, still
      // inside the 10-min watermark delay
      in.addData(ev(2, 3, "view"))
    }
    // both stages reached — a naive apply-on-arrival funnel would have
    // discarded the click (no view yet) and never re-examined it
    assert(got === Map((2L, 0) -> ts(3), (2L, 1) -> ts(8)))
  }

  test("click before view in EVENT time never converts; same-ts does not either") {
    val got = run("sf3") { in =>
      in.addData(ev(3, 5, "click"), ev(3, 10, "view")) // click earlier in ts
      in.addData(ev(4, 7, "view"), ev(4, 7, "click"))  // same instant
    }
    assert(got === Map((3L, 0) -> ts(10), (4L, 0) -> ts(7)))
  }

  test("funnel state survives a kill-and-restart from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("funnel-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("funnel-out").toString
    val in = MemoryStream[StatefulOps.TypedEvent]
    // the memory sink refuses checkpoint recovery — use the parquet
    // sink, which replays committed offsets on restart
    def start() =
      StatefulOps.funnelStages(s, in.toDS(), Stages, "10 minutes")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    def emitted(): Map[Int, Timestamp] =
      s.read.parquet(out).filter(col("user_id") === 1L)
        .select("stage", "at").collect()
        .map(r => r.getInt(0) -> r.getTimestamp(1)).toMap
    // leg 1: the view finalizes (watermark pushed past it), then KILL
    val q1 = start()
    try {
      in.addData(ev(1, 0, "view"))
      in.addData(StatefulOps.TypedEvent(99L,
        Timestamp.valueOf("2024-01-01 11:00:00"), "error"))
      q1.processAllAvailable()
      assert(emitted() === Map(0 -> ts(0)), s"pre-restart: ${emitted()}")
    } finally q1.stop()
    // leg 2: restart from the SAME checkpoint; a click after the view
    // converts ONLY if the recovered state still holds t0 = 10:00
    // (lost state would leave the funnel at stage 0, where a click
    // cannot advance anything)
    val q2 = start()
    try {
      in.addData(StatefulOps.TypedEvent(1L,
        Timestamp.valueOf("2024-01-01 11:05:00"), "click"))
      in.addData(StatefulOps.TypedEvent(99L,
        Timestamp.valueOf("2024-01-01 12:30:00"), "error"))
      q2.processAllAvailable()
      assert(emitted() === Map(0 -> ts(0),
        1 -> Timestamp.valueOf("2024-01-01 11:05:00")),
        s"post-restart: ${emitted()}")
    } finally q2.stop()
  }

  test("streaming emissions equal the batch Funnel stage times") {
    val fixture = Seq(
      ev(10, 0, "view"), ev(10, 2, "click"), ev(10, 1, "click"),
      ev(10, 4, "purchase"), ev(11, 3, "click"), ev(11, 6, "view"),
      ev(11, 9, "click"), ev(12, 5, "view"))
    val got = run("sf4") { in => fixture.grouped(3).foreach(in.addData(_)) }
    val s = spark
    import s.implicits._
    val batch = graft.operators.Funnel.stageTimes(
        fixture.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Stages)
      .collect().flatMap { r =>
        (0 until 3).flatMap { k =>
          Option(r.get(k + 1)).map(t =>
            (r.getLong(0), k) -> t.asInstanceOf[Timestamp])
        }
      }.toMap
    assert(got === batch)
  }
}
