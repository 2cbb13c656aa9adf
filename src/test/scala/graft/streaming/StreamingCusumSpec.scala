package graft.streaming

import graft.SparkTestBase
import graft.operators.Cusum
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming CUSUM (StreamingCusum.chart): the causal recurrence must
  * emit exactly the batch alarmsFixed rows whatever the arrival order
  * across micro-batches — buckets apply only once the watermark
  * finalizes them, in event-time order. */
class StreamingCusumSpec extends SparkTestBase {

  import StreamingCusum.{BucketCount, ChartRow}

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private def bc(e: Long, m: Int, n: Long) = BucketCount(e, ts(m), n)

  private def run(name: String)(feed: MemoryStream[BucketCount] => Unit): Seq[ChartRow] = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[BucketCount]
    val q = StreamingCusum.chart(s, in.toDS(), mu = 5L, h = 6L, "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      feed(in)
      in.addData(BucketCount(99L, Timestamp.valueOf("2024-01-01 18:00:00"), 0L))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("entity") =!= 99L)
      .as[ChartRow].collect().toSeq
  }

  test("recurrence floors at zero and alarms past the threshold") {
    val log = run("cu1") { in =>
      // x−μ: +3, −4 (floors at 0), +5, +4 (crosses h=6 at 9)
      in.addData(bc(1, 0, 8), bc(1, 1, 1), bc(1, 2, 10), bc(1, 3, 9))
    }
    assert(log.map(r => (r.t_stat, r.alarm)) ===
      Seq((3L, false), (0L, false), (5L, false), (9L, true)))
  }

  test("stream equals batch alarmsFixed under shuffled arrival") {
    val fixture = Seq(
      bc(1, 0, 8), bc(1, 1, 1), bc(1, 2, 10), bc(1, 3, 9), bc(1, 4, 2),
      bc(2, 0, 6), bc(2, 2, 7), bc(2, 5, 12), bc(2, 7, 1))
    val scrambled = Seq(fixture(3), fixture(0), fixture(7), fixture(5),
      fixture(1), fixture(8), fixture(2), fixture(6), fixture(4))
    val got = run("cu2") { in => scrambled.grouped(3).foreach(in.addData(_: _*)) }
      .map(r => (r.entity, r.ts, r.t_stat, r.alarm)).toSet
    val s = spark
    import s.implicits._
    val batch = Cusum.alarmsFixed(
        fixture.toDF("entity", "ts", "n"), "entity", "ts", "n", mu = 5L, h = 6L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === batch)
  }
}
