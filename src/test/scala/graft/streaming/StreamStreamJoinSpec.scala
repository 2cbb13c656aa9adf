package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream interval join (StreamingJoin): inner parity with the
  * batch join under shuffled arrival, and the left-outer
  * emit-on-watermark contract. */
class StreamStreamJoinSpec extends SparkTestBase {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val views = Seq( // (user, ts, event)
    (1L, ts(0), 100L), (1L, ts(30), 101L), (2L, ts(5), 102L),
    (3L, ts(10), 103L))
  private val clicks = Seq(
    (1L, ts(4), 200L),  // matches 100 (within 10 min)
    (1L, ts(34), 201L), // matches 101
    (1L, ts(20), 202L), // matches nothing (100+10min < 10:20 < 101)
    (2L, ts(16), 203L)) // outside 102's window

  test("stream-stream inner interval join equals the batch join, shuffled arrival") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    // 40-min delay: the out-of-order second batch (10:00/10:04 after a
    // 10:34 max) must stay ahead of the watermark to be admissible
    val joined = StreamingJoin.within(
      vIn.toDF().toDF("user_id", "ts", "event_id"),
      cIn.toDF().toDF("user_id", "ts", "event_id"),
      withinSec = 600, wmDelay = "40 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_inner").start()
    // shuffled, interleaved arrival — late-but-admissible rows included
    vIn.addData(views(1), views(3))
    cIn.addData(clicks(1), clicks(3))
    q.processAllAvailable()
    vIn.addData(views(0), views(2))
    cIn.addData(clicks(0), clicks(2))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_inner")
      .select($"l_event", $"r_event").as[(Long, Long)]
      .collect().toSeq.sorted
    // batch ground truth over the same rows
    val bv = views.toDF("user_id", "ts", "event_id")
      .select($"user_id".as("l_user"), $"ts".as("l_ts"), $"event_id".as("l_event"))
    val bc = clicks.toDF("user_id", "ts", "event_id")
      .select($"user_id".as("r_user"), $"ts".as("r_ts"), $"event_id".as("r_event"))
    val batch = bv.join(bc, $"l_user" === $"r_user" &&
        $"r_ts" >= $"l_ts" && $"r_ts" < $"l_ts" + expr("INTERVAL 600 SECONDS"))
      .select($"l_event", $"r_event").as[(Long, Long)]
      .collect().toSeq.sorted
    assert(batch === Seq((100L, 200L), (101L, 201L)))
    assert(got === batch)
  }

  test("left-outer emits never-matched views null-padded once the watermark proves it") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingJoin.withinLeftOuter(
      vIn.toDF().toDF("user_id", "ts", "event_id"),
      cIn.toDF().toDF("user_id", "ts", "event_id"),
      withinSec = 600, wmDelay = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    // only rows up to 10:16: watermark = 10:06, before every join
    // window's end — no no-match is provable yet
    vIn.addData(views(0), views(2), views(3))
    cIn.addData(clicks(0), clicks(3))
    q.processAllAvailable()
    // nothing unmatched may emit yet: the watermark hasn't passed the
    // join windows (outer results wait for proof of no-match)
    val early = spark.table("ssj_outer")
      .filter($"r_event".isNull).count()
    assert(early === 0, "unmatched rows must wait for the watermark")
    // advance event time on BOTH sides far past every window
    vIn.addData((9L, Timestamp.valueOf("2024-01-01 13:00:00"), 900L))
    cIn.addData((9L, Timestamp.valueOf("2024-01-01 13:00:00"), 901L))
    q.processAllAvailable()
    vIn.addData((9L, Timestamp.valueOf("2024-01-01 14:00:00"), 902L))
    cIn.addData((9L, Timestamp.valueOf("2024-01-01 14:00:00"), 903L))
    q.processAllAvailable()
    q.stop()
    val unmatched = spark.table("ssj_outer")
      .filter($"r_event".isNull && $"l_event".isin(100L, 102L, 103L))
      .select($"l_event").as[Long].collect().toSeq.sorted
    // 102 (click 203 is outside its window) and 103 (no click at all)
    // never converted; 100 matched click 200 inner
    assert(unmatched === Seq(102L, 103L))
    val matched = spark.table("ssj_outer")
      .filter($"r_event".isNotNull && $"l_event" === 100L).count()
    assert(matched === 1)
  }
}
