package graft.cdc

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkTestBase

/** CdcPipeline.compact / readCurrentState — snapshot materialization of
  * a landed lake plus incremental merge of only post-snapshot changes
  * (the r7 verdict's landed-lake read-amplification item). The oracle-
  * level equivalence against full history is q88 (hash-checked against
  * q87's DuckDB twin); these tests pin the operator-level semantics:
  * latest-wins across the snapshot boundary, delete/reinsert handling,
  * re-compaction, high-water bookkeeping, and the delta-pruning plan.
  */
class CompactSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("pk", StringType), StructField("v", LongType)))

  /** A tiny landed lake in CdcPipeline.land's output layout. */
  private def writeLake(rows: Seq[(String, Long, Int, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("compact-lake").toString
    rows.toDF("operation", "binlog_position", "row_idx", "rows_json")
      .withColumn("binlog_file", lit("mysql-bin.000001"))
      .withColumn("database", lit("db")).withColumn("table", lit("t"))
      .write.mode("overwrite").partitionBy("database", "table").parquet(dir)
    dir
  }

  private def row(pk: String, v: Long) = s"""[{"pk":"$pk","v":"$v"}]"""

  private def state(lake: String, snap: String): Seq[(String, Long)] =
    CdcPipeline.readCurrentState(spark, lake, snap, "db", "t", schema)
      .select(col("pk"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq

  test("snapshot + delta merge equals full history across the boundary") {
    // k1: INSERT@1 then UPDATE@5 (delta wins over snapshot)
    // k2: INSERT@2 then DELETE@6 (delta delete kills a snapshotted key)
    // k3: INSERT@7 (delta-only key)
    // k4: DELETE@3 then INSERT@8 (deleted pre-snapshot — absent from the
    //     snapshot without any tombstone — then re-inserted in the delta)
    val lake = writeLake(Seq(
      ("INSERT", 1L, 0, row("k1", 10)), ("INSERT", 2L, 0, row("k2", 20)),
      ("DELETE", 3L, 0, row("k4", 40)), ("UPDATE", 5L, 0, row("k1", 11)),
      ("DELETE", 6L, 0, row("k2", 21)), ("INSERT", 7L, 0, row("k3", 30)),
      ("INSERT", 8L, 0, row("k4", 41))))
    val snap = Files.createTempDirectory("compact-snap").toString
    val hw = CdcPipeline.compact(spark, lake, snap, "db", "t", "pk",
      upTo = Some(("mysql-bin.000001", 4L)))
    // high-water = the max change actually scanned (3), never upTo
    // itself: claiming the quiet region up to 4 would be wrong if a
    // future landing filled it
    assert(hw == ("mysql-bin.000001", 3L))
    // the snapshot itself holds only the covered live rows
    val snapPks = spark.read.parquet(s"$snap/state")
      .select("pk").collect().map(_.getString(0)).sorted.toSeq
    assert(snapPks == Seq("k1", "k2"))
    assert(state(lake, snap) == Seq("k1" -> 11L, "k3" -> 30L, "k4" -> 41L))
  }

  test("re-compaction advances the snapshot incrementally; empty delta reads") {
    val lake = writeLake(Seq(
      ("INSERT", 1L, 0, row("k1", 10)), ("INSERT", 2L, 0, row("k2", 20)),
      ("UPDATE", 5L, 0, row("k1", 11)), ("DELETE", 6L, 0, row("k2", 21))))
    val snap = Files.createTempDirectory("compact-snap2").toString
    CdcPipeline.compact(spark, lake, snap, "db", "t", "pk",
      upTo = Some(("mysql-bin.000001", 4L)))
    // second compact covers the rest: reads prior snapshot + delta only
    val hw2 = CdcPipeline.compact(spark, lake, snap, "db", "t", "pk")
    assert(hw2 == ("mysql-bin.000001", 6L))
    assert(CdcPipeline.readSnapshotMeta(snap)
      .map(m => (m.binlogFile, m.binlogPosition)) ==
      Some(("mysql-bin.000001", 6L)))
    val snapPks = spark.read.parquet(s"$snap/state")
      .select("pk").collect().map(_.getString(0)).toSeq
    assert(snapPks == Seq("k1"))
    assert(state(lake, snap) == Seq("k1" -> 11L))
  }

  test("high-water never regresses: a trailing DELETE is covered coverage") {
    // last covered change is a DELETE — absent from the snapshot rows,
    // but the high-water must still advance past it, or every later
    // read would re-apply it as delta forever
    val lake = writeLake(Seq(
      ("INSERT", 1L, 0, row("k1", 10)), ("DELETE", 2L, 0, row("k1", 10))))
    val snap = Files.createTempDirectory("compact-snap3").toString
    val hw = CdcPipeline.compact(spark, lake, snap, "db", "t", "pk")
    assert(hw == ("mysql-bin.000001", 2L))
    assert(state(lake, snap) == Seq.empty)
    // all-deleted lake re-compacts without error and keeps its coverage
    val hw2 = CdcPipeline.compact(spark, lake, snap, "db", "t", "pk")
    assert(hw2 == ("mysql-bin.000001", 2L))
  }

  test("multi-row events break ties by element position") {
    // one event (position 1) carries two rows for the SAME pk (an
    // itemByRow=false landing); the later element wins, and a
    // subsequent event still outranks both
    val lake = writeLake(Seq(
      ("INSERT", 1L, 0, """[{"pk":"k1","v":"1"},{"pk":"k1","v":"2"}]"""),
      ("UPDATE", 2L, 0, row("k1", 3))))
    val snap = Files.createTempDirectory("compact-snap4").toString
    CdcPipeline.compact(spark, lake, snap, "db", "t", "pk",
      upTo = Some(("mysql-bin.000001", 1L)))
    val sv = spark.read.parquet(s"$snap/state")
      .select("pk", "row_json").collect().map(r => (r.getString(0), r.getString(1)))
    assert(sv.toSeq == Seq("k1" -> """{"pk":"k1","v":"2"}"""))
    assert(state(lake, snap) == Seq("k1" -> 3L))
  }

  test("compactIfNeeded: bootstrap, within-bounds no-op, ratio-triggered re-compact") {
    val s = spark
    import s.implicits._
    val lake = writeLake(Seq(
      ("INSERT", 1L, 0, row("k1", 10)), ("INSERT", 2L, 0, row("k2", 20)),
      ("INSERT", 3L, 0, row("k3", 30)), ("INSERT", 4L, 0, row("k4", 40))))
    val snap = Files.createTempDirectory("compact-snap7").toString
    // no snapshot yet -> bootstraps one
    assert(CdcPipeline.compactIfNeeded(spark, lake, snap, "db", "t", "pk")
      == Some(("mysql-bin.000001", 4L)))
    // zero delta -> no-op regardless of thresholds
    assert(CdcPipeline.compactIfNeeded(spark, lake, snap, "db", "t", "pk") == None)
    // one new change against 4 live rows: under the 50% ratio -> no-op,
    // under a lower ratio -> re-compacts and advances the high-water
    Seq(("UPDATE", 5L, 0, row("k1", 11)))
      .toDF("operation", "binlog_position", "row_idx", "rows_json")
      .withColumn("binlog_file", lit("mysql-bin.000001"))
      .withColumn("database", lit("db")).withColumn("table", lit("t"))
      .write.mode("append").partitionBy("database", "table").parquet(lake)
    assert(CdcPipeline.compactIfNeeded(spark, lake, snap, "db", "t", "pk",
      maxDeltaRatio = 0.5) == None)
    assert(CdcPipeline.compactIfNeeded(spark, lake, snap, "db", "t", "pk",
      maxDeltaRatio = 0.2) == Some(("mysql-bin.000001", 5L)))
    assert(state(lake, snap) ==
      Seq("k1" -> 11L, "k2" -> 20L, "k3" -> 30L, "k4" -> 40L))
  }

  test("identity mismatches and missing snapshot fail loudly") {
    val lake = writeLake(Seq(("INSERT", 1L, 0, row("k1", 10))))
    val snap = Files.createTempDirectory("compact-snap5").toString
    intercept[RuntimeException] {
      CdcPipeline.readCurrentState(spark, lake, snap, "db", "t", schema)
    }
    CdcPipeline.compact(spark, lake, snap, "db", "t", "pk")
    // wrong key definition
    val e = intercept[IllegalArgumentException] {
      CdcPipeline.compact(spark, lake, snap, "db", "t", "other")
    }
    assert(e.getMessage.contains("one snapshot tracks one table"))
    // wrong table: a snapshotDir aimed at another table must never
    // merge cross-table state — compact, the cadence check, and the
    // read all refuse
    for (bad <- Seq(
        () => CdcPipeline.compact(spark, lake, snap, "db", "t2", "pk"),
        () => CdcPipeline.compactIfNeeded(spark, lake, snap, "db", "t2", "pk"),
        () => CdcPipeline.readCurrentState(spark, lake, snap, "db", "t2", schema))) {
      val m = intercept[IllegalArgumentException](bad()).getMessage
      assert(m.contains("(db, t2)"), m)
    }
  }

  test("kill→compact→restart: snapshot+delta equals full history (r8 verdict item 9)") {
    // Composes r7's restart recovery with r8's compaction through the
    // REAL landing pipeline: the capture stream dies after committing
    // part of the feed (leaving an uncommitted parquet file in the lake
    // dir — the debris a mid-batch kill produces), the partial lake is
    // compacted, the stream restarts from the SAME checkpoint and lands
    // the rest, and readCurrentState over snapshot+delta must equal the
    // full-history fold — with the orphan file ignored via the sink's
    // _spark_metadata commit log.
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("cr-src")
    Files.writeString(src.resolve("changes-00000.jsonl"),
      """{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":120,"database":"db","table":"t","colNames":["pk","v"],"rows":[["k1","1"]]}
        |{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":200,"database":"db","table":"t","colNames":["pk","v"],"rows":[["k2","2"]]}
        |{"eventType":"UpdateRowsEventV2","binlogFile":"mysql-bin.000001","binlogPosition":260,"database":"db","table":"t","colNames":["pk","v"],"rows":[["k1","1"],["k1","3"]]}""".stripMargin)
    val cfg = Config.parse(
      """{"serverId":"cr1","itemByRow":true,"dbTables":{"db":["t"]}}""")
    val lake = Files.createTempDirectory("cr-lake").toString
    val ckpt = Files.createTempDirectory("cr-ckpt").toString
    assert(CdcPipeline.land(spark, cfg, src.toString, ckpt, lake)
      .awaitTermination(60000))
    // the kill's debris: a well-formed parquet file in the partition dir
    // that no sink commit ever logged — if the lake read trusted the
    // directory listing instead of _spark_metadata, this poison row
    // (k1 at a far-future position) would win every merge below
    val orphanSrc = Files.createTempDirectory("cr-orphan").toString
    Seq(("INSERT", 999999L, 0, row("k1", 999)))
      .toDF("operation", "binlog_position", "row_idx", "rows_json")
      .withColumn("binlog_file", lit("mysql-bin.000009"))
      .coalesce(1).write.mode("overwrite").parquet(orphanSrc)
    val orphan = Files.list(java.nio.file.Paths.get(orphanSrc))
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(orphan, java.nio.file.Paths.get(
      lake, "database=db", "table=t", "part-99999-orphan.parquet"))
    // compact the partial lake (covers the whole first segment)
    val snap = Files.createTempDirectory("cr-snap").toString
    val hw = CdcPipeline.compact(spark, lake, snap, "db", "t", "pk")
    assert(hw == ("mysql-bin.000001", 260L))
    assert(state(lake, snap) == Seq("k1" -> 3L, "k2" -> 2L))
    // the feed continues; restart from the SAME checkpoint lands ONLY
    // the new segment (exactly-once via source offsets + sink log)
    Files.writeString(src.resolve("changes-00001.jsonl"),
      """{"eventType":"DeleteRowsEventV2","binlogFile":"mysql-bin.000002","binlogPosition":30,"database":"db","table":"t","colNames":["pk","v"],"rows":[["k2","2"]]}
        |{"eventType":"WriteRowsEventV2","binlogFile":"mysql-bin.000002","binlogPosition":50,"database":"db","table":"t","colNames":["pk","v"],"rows":[["k3","9"]]}
        |{"eventType":"UpdateRowsEventV2","binlogFile":"mysql-bin.000002","binlogPosition":80,"database":"db","table":"t","colNames":["pk","v"],"rows":[["k1","3"],["k1","7"]]}""".stripMargin)
    assert(CdcPipeline.land(spark, cfg, src.toString, ckpt, lake)
      .awaitTermination(60000))
    // snapshot (first segment) + delta (second) = the full-history fold;
    // the orphan's poison row must be invisible
    val merged = state(lake, snap)
    assert(merged == Seq("k1" -> 7L, "k3" -> 9L))
    // and identical to a from-scratch compaction of the whole lake
    val snap2 = Files.createTempDirectory("cr-snap2").toString
    assert(CdcPipeline.compact(spark, lake, snap2, "db", "t", "pk")
      == ("mysql-bin.000002", 80L))
    assert(state(lake, snap2) == merged)
    // re-compacting the ORIGINAL snapshot across the restart boundary
    // also converges to the same state
    assert(CdcPipeline.compact(spark, lake, snap, "db", "t", "pk")
      == ("mysql-bin.000002", 80L))
    assert(state(lake, snap) == merged)
  }

  test("the delta read prunes: (file, position) range filter reaches the lake scan") {
    val lake = writeLake(Seq(
      ("INSERT", 1L, 0, row("k1", 10)), ("UPDATE", 5L, 0, row("k1", 11))))
    val snap = Files.createTempDirectory("compact-snap6").toString
    CdcPipeline.compact(spark, lake, snap, "db", "t", "pk",
      upTo = Some(("mysql-bin.000001", 4L)))
    // widen the scan-metadata rendering so the assertion sees the whole
    // pushed filter (default truncates at 100 chars)
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try {
      val p = CdcPipeline.readCurrentState(spark, lake, snap, "db", "t", schema)
        .queryExecution.executedPlan.toString
      // the high-water predicate pushes into the lake's parquet scan —
      // row-group min/max stats on binlog_position skip compacted files
      // (high-water = 1, the max scanned change at the cutoff)
      assert(p.contains("GreaterThan(binlog_position,1)"), p)
      // and the (database, table) filter prunes lake partitions
      assert(p.contains("PartitionFilters: [isnotnull(database") , p)
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }
}
