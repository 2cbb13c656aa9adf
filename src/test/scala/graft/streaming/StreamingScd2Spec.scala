package graft.streaming

import graft.SparkTestBase
import graft.operators.Scd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming SCD2 (StreamingScd2.versions): the changelog the versioner
  * emits, merged last-wins per (entity, version), must equal the batch
  * Scd2.build table on the same admissible input — arrival order across
  * micro-batches must not matter (events apply only once the watermark
  * finalizes them, in (ts, tie) order). */
class StreamingScd2Spec extends SparkTestBase {

  import StreamingScd2.{Scd2Change, Scd2Version}

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private def ch(e: Long, m: Int, tie: Long, v: String, del: Boolean = false) =
    Scd2Change(e, ts(m), tie, v, del)

  /** Run the versioner over the fed batches, push the watermark far past
    * every fixture event, return the changelog rows (sans sentinel). */
  private def run(name: String)(feed: MemoryStream[Scd2Change] => Unit): Seq[Scd2Version] = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Scd2Change]
    val q = StreamingScd2.versions(s, in.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      feed(in)
      in.addData(Scd2Change(99L, Timestamp.valueOf("2024-01-01 18:00:00"), 0L, "z"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("entity") =!= 99L)
      .as[Scd2Version].collect().toSeq
  }

  /** Merge the changelog (last-wins per (entity, eff_from)) and project
    * to comparable tuples. */
  private def merged(log: Seq[Scd2Version]): Set[(Long, String, Long, Timestamp, Timestamp)] = {
    val s = spark
    import s.implicits._
    StreamingScd2.applyChangelog(log.toDF())
      .as[Scd2Version].collect()
      .map(v => (v.entity, v.value, v.version, v.eff_from, v.eff_to)).toSet
  }

  private def batch(events: Seq[Scd2Change]): Set[(Long, String, Long, Timestamp, Timestamp)] = {
    val s = spark
    import s.implicits._
    Scd2.build(events.toDF(), "entity", "ts", "tie", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
  }

  test("in-order changes: open+close changelog, run-length collapsed") {
    val log = run("scd1") { in =>
      in.addData(ch(1, 0, 1, "O"), ch(1, 2, 2, "O"), ch(1, 5, 3, "F"))
    }
    // version 1 opens at 10:00 (the 10:02 "O" collapses), closes at 10:05;
    // version 2 opens at 10:05 and stays open
    assert(log.toSet === Set(
      Scd2Version(1, "O", 1, ts(0), null),
      Scd2Version(1, "O", 1, ts(0), ts(5)),
      Scd2Version(1, "F", 2, ts(5), null)))
  }

  test("late-but-admissible earlier event versions in event-time order") {
    val events = Seq(ch(2, 6, 2, "B"), ch(2, 1, 1, "A"), ch(2, 9, 3, "C"))
    val log = run("scd2") { in =>
      in.addData(events(0))           // B arrives first…
      in.addData(events(1))           // …but A's ts is earlier, still admissible
      in.addData(events(2))
    }
    assert(merged(log) === batch(events))
    // and explicitly: A opened version 1, B version 2
    assert(merged(log).map(t => (t._2, t._3)) ===
      Set(("A", 1L), ("B", 2L), ("C", 3L)))
  }

  test("NULL first value still opens version 1 (the lag() ambiguity case)") {
    val events = Seq(ch(3, 0, 1, null), ch(3, 4, 2, "X"), ch(3, 7, 3, null))
    val log = run("scd3") { in => in.addData(events: _*) }
    assert(merged(log) === batch(events))
    assert(merged(log).map(_._3) === Set(1L, 2L, 3L))
  }

  test("delete closes the open version; a re-insert starts a new lineage") {
    val log = run("scd4") { in =>
      in.addData(ch(4, 0, 1, "A"), ch(4, 3, 2, "B"))
      in.addData(ch(4, 6, 3, null, del = true))
      in.addData(ch(4, 8, 4, "C")) // reappears after the delete
    }
    val m = merged(log)
    // two closed versions from the first lifetime, then a fresh version 1
    assert(m === Set(
      (4L, "A", 1L, ts(0), ts(3)),
      (4L, "B", 2L, ts(3), ts(6)),
      (4L, "C", 1L, ts(8), null)))
  }

  test("stream changelog merged == batch Scd2.build on a shuffled fixture") {
    val events = Seq(
      ch(10, 0, 1, "N"), ch(10, 2, 2, "O"), ch(10, 4, 3, "O"), ch(10, 7, 4, "F"),
      ch(11, 1, 1, "F"), ch(11, 3, 2, null), ch(11, 5, 3, null), ch(11, 8, 4, "O"),
      ch(12, 6, 1, "P"))
    // deliver in a scrambled arrival order, three micro-batches
    val scrambled = Seq(events(3), events(0), events(8), events(5), events(1),
      events(7), events(2), events(4), events(6))
    val log = run("scd5") { in => scrambled.grouped(3).foreach(in.addData(_: _*)) }
    assert(merged(log) === batch(events))
  }

  test("same-instant changes keep BOTH versions through the changelog merge") {
    // the r10 review case: two changes at one ts share eff_from; a
    // merge keyed on (entity, eff_from) alone would drop the v2 open
    // row under the v1 close row — the key must include version
    val events = Seq(ch(20, 5, 1, "A"), ch(20, 5, 2, "B"))
    val log = run("scd7") { in => in.addData(events: _*) }
    assert(merged(log) === batch(events))
  }

  test("a same-instant lower-tie arrival in a LATER batch still applies in (ts, tie) order") {
    // the r10 boundary fix: an event with ts == watermark must HOLD
    // (it is still admissible for later batches), so (ts=2,tie=1,A)
    // arriving after (ts=2,tie=2,B) is applied before it
    val events = Seq(ch(30, 2, 2, "B"), ch(30, 2, 1, "A"))
    val log = run("scd8") { in =>
      in.addData(ch(31, 12, 1, "w")) // push wm to ts(2) exactly (10-min delay)
      in.addData(events(0))
      in.addData(events(1))
    }
    val got = merged(log).filter(_._1 == 30L)
    val want = batch(Seq(ch(30, 2, 1, "A"), ch(30, 2, 2, "B")))
    assert(got === want)
  }

  test("point-in-time join against the STREAMED dimension equals the batch PIT join") {
    // the q134 consumer composed over the streaming versioner: facts
    // joined at their own instants must see the same version whether
    // the dimension was streamed (shuffled arrival) or built in batch
    val s = spark
    import s.implicits._
    val events = Seq(
      ch(10, 0, 1, "N"), ch(10, 2, 2, "O"), ch(10, 7, 3, "F"),
      ch(11, 1, 1, "F"), ch(11, 5, 2, "O"),
      ch(12, 6, 1, "P"))
    val scrambled = Seq(events(4), events(0), events(5), events(2),
      events(1), events(3))
    val log = run("scd6") { in => scrambled.grouped(2).foreach(in.addData(_: _*)) }
    val streamDim = StreamingScd2.applyChangelog(log.toDF())
    val batchDim = Scd2.build(events.toDF(), "entity", "ts", "tie", "value")
    val facts = Seq((10L, ts(1)), (10L, ts(2)), (10L, ts(9)),
      (11L, ts(3)), (11L, ts(6)), (12L, ts(7))).toDF("f_ent", "f_t")
    def pit(dim: org.apache.spark.sql.DataFrame) =
      facts.join(dim, col("f_ent") === col("entity") &&
          col("eff_from") <= col("f_t") &&
          (col("eff_to").isNull || col("eff_to") > col("f_t")))
        .select(col("f_ent"), col("f_t"), col("value"), col("version"))
        .as[(Long, Timestamp, String, Long)].collect().toSeq.sorted
    val viaStream = pit(streamDim)
    val viaBatch = pit(batchDim)
    assert(viaStream === viaBatch)
    // every fact matches exactly one version (end-exclusive intervals)
    assert(viaStream.size === facts.count())
  }
}
