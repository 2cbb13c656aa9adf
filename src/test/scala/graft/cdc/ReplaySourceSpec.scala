package graft.cdc

import java.nio.file.{Files, Path}
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end CDC path over the DSv2 replay source (SURVEY.md M2/M3):
  * source → decode → route → template → sink, with rotate-across-files,
  * bounded triggers, checkpoint resume, and at-least-once + idempotency. */
class ReplaySourceSpec extends SparkTestBase {

  private def jline(et: String, file: String, pos: Long, db: String,
      tbl: String, cols: Seq[String], rows: Seq[Seq[String]]): String = {
    val colsJ = cols.map(c => s""""$c"""").mkString("[", ",", "]")
    val rowsJ = rows.map(r => r.map(v => s""""$v"""").mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    s"""{"eventType":"$et","binlogFile":"$file","binlogPosition":$pos,""" +
      s""""database":"$db","table":"$tbl","colNames":$colsJ,"rows":$rowsJ}"""
  }

  /** 3 binlog files, 30 INSERTs total — the cdc_rotate fixture shape
    * (FIXTURES.md §2). */
  private def writeFixtures(dir: Path): Unit = {
    (1 to 3).foreach { f =>
      val lines = (1 to 10).map { i =>
        jline("WriteRowsEventV2", f"mysql-bin.00000$f", 100L + i * 50,
          "testdb", "users", Seq("id", "name"), Seq(Seq(s"${f * 100 + i}", s"n$i")))
      }
      Files.write(dir.resolve(f"mysql-bin.00000$f.jsonl"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    }
  }

  private val watched = Map("testdb" -> Seq("users"))
  private val route = Route("users", "collector",
    Seq("INSERT", "UPDATE", "DELETE"), "testdb.users",
    """{"id":"{{ (index .Data.Rows 0).id }}","op":"{{ .Data.Operation }}"}""")

  test("streams all events across file rotations, bounded per trigger") {
    val dir = Files.createTempDirectory("binlog-replay")
    writeFixtures(dir)
    CollectingConnector.clear()
    val conns: Map[String, Connector] = Map("collector" -> new CollectingConnector("t1"))

    val raw = spark.readStream.format("binlog-replay")
      .option("path", dir.toString)
      .option("maxEventsPerTrigger", "7")
      .load()
    val envelope = Decode.decode(raw, watched)
    val q = envelope.writeStream
      .foreachBatch(Connectors.forEachBatch(Seq(route), conns))
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val got = CollectingConnector.drain("t1")
    assert(got.size == 30, s"expected 30 deliveries, got ${got.size}")
    // idempotency keys are unique (file/pos/rowIdx)
    assert(got.map(_._1).distinct.size == 30)
    // payloads rendered by the route template
    assert(got.forall(_._2.contains(""""op":"INSERT"""")))
  }

  test("checkpoint resume continues, idempotency keys absorb the overlap") {
    val dir = Files.createTempDirectory("binlog-replay2")
    val ckpt = Files.createTempDirectory("ckpt2")
    writeFixtures(dir)
    CollectingConnector.clear()
    val conns: Map[String, Connector] = Map("collector" -> new CollectingConnector("t2"))

    def runOnce(): Unit = {
      val raw = spark.readStream.format("binlog-replay")
        .option("path", dir.toString).option("maxEventsPerTrigger", "11").load()
      val q = Decode.decode(raw, watched).writeStream
        .foreachBatch(Connectors.forEachBatch(Seq(route), conns))
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    val afterFirst = CollectingConnector.drain("t2").size
    assert(afterFirst == 30)
    runOnce() // restart from checkpoint: nothing new to read
    val all = CollectingConnector.drain("t2")
    // at-least-once: a restart may not resend anything here (offsets are
    // committed); distinct idempotency keys must still be exactly 30.
    assert(all.map(_._1).distinct.size == 30)
  }

  test("startingFile honored when no checkpoint (startLocation precedence)") {
    val dir = Files.createTempDirectory("binlog-replay3")
    writeFixtures(dir)
    val raw = spark.readStream.format("binlog-replay")
      .option("path", dir.toString)
      .option("startingFile", "mysql-bin.000002").load()
    val q = Decode.decode(raw, watched).writeStream
      .format("memory").queryName("from_file2")
      .option("checkpointLocation", Files.createTempDirectory("ckpt3").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val files = spark.table("from_file2").select(col("log.binlogFile")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(files.toSeq == Seq("mysql-bin.000002", "mysql-bin.000003"))
  }

  test("batch read over the same fixtures (BATCH_READ capability)") {
    val dir = Files.createTempDirectory("binlog-replay4")
    writeFixtures(dir)
    val n = spark.read.format("binlog-replay").option("path", dir.toString)
      .load().count()
    assert(n == 30)
  }
}
