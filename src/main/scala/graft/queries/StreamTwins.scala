package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.{Canon, Tables}
import graft.cdc.{CdcPipeline, Config}
import Canon._

/** Batch twins of the streaming queries (SURVEY.md B25–B28). The same
  * transformations run as true Structured Streaming queries in
  * `graft.streaming` (tested with MemoryStream in StreamingSpec); the
  * oracle checks the batch-equivalent semantics — Spark guarantees
  * batch/stream parity for windowed aggregates over in-order input.
  */
object StreamTwins extends QueryGroup {

  private val TS = "'%Y-%m-%d %H:%M:%S'"
  private val GapNs: Long = 30L * 60L * 1000000000L // 30-min session gap

  // --- q87: source→lake→operator composition ------------------------------
  // Bounded LRU like Tables.relationCache (same reasoning: the key
  // strongly references its SparkSession, so an unbounded map would pin
  // every session a churning JVM ever created). Evicted entries just
  // drop the path reference — the temp lake stays on disk for any
  // in-flight readers and dies with /tmp.
  private val landedLakes =
    new java.util.LinkedHashMap[(SparkSession, String), String](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), String]): Boolean =
        size() > 8
    }

  // q88's compacted snapshot of the q87 lake, same caching physics.
  private val lakeSnapshots =
    new java.util.LinkedHashMap[(SparkSession, String), (String, Long)](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), (String, Long)]): Boolean =
        size() > 8
    }

  /** Wall-clock of the one-time q87 landing / q88 compaction jobs (the
    * capture→lake leg the per-query bench numbers deliberately exclude
    * — landing is a continuously-running stream in production). Bench
    * surfaces these as elapsed_landing_sec / elapsed_compact_sec so the
    * round artifact records the leg's cost (r7 verdict item). */
  @volatile var landingElapsedSec: Option[Double] = None
  @volatile var compactElapsedSec: Option[Double] = None

  /** Build ONCE per (session, dataset) the q87 landed lake: derive the
    * deterministic change stream from `documents` (q62's op rules; pk =
    * doc_id div 3 so each key sees ~3 versions, seq = doc_id =
    * binlogPosition), write it as binlog-replay JSONL, and run the REAL
    * capture pipeline — binlog-replay DSv2 source → Decode →
    * CdcPipeline.land — into a (database, table)-partitioned parquet
    * lake, exactly-once via the file sink's commit log.
    *
    * The generator (a Spark job writing JSONL, renamed to the feed's
    * segment naming) plays the MySQL SERVER side of the seam; nothing
    * here collects data to the driver — the renames are metadata ops.
    * Caching mirrors production physics: landing is a continuously-
    * running capture stream whose throughput is measured separately
    * (CdcThroughput); analytics queries read the landed lake. A bench
    * rerun therefore re-reads the lake, it does not re-capture it. */
  private def landedDocsLake(s: SparkSession, d: String): String =
    // synchronized over the whole build: LinkedHashMap isn't concurrent,
    // and two racing builders would land the same lake twice anyway
    landedLakes.synchronized { Option(landedLakes.get((s, d))).getOrElse {
      import scala.jdk.CollectionConverters._
      val work = java.nio.file.Files.createTempDirectory("graft-q87").toString
      val src = s"$work/src"; val out = s"$work/lake"; val ckpt = s"$work/ckpt"
      val pkS = expr("doc_id div 3").cast("string")
      val after = array(pkS, col("lang"), col("n_chars").cast("string"), col("text"))
      val before = array(pkS, col("lang"), lit("0"), lit("")) // discarded image
      val op = col("doc_id") % 10
      Tables.documents(s, d).select(to_json(struct(
          when(op < 6, "WriteRowsEventV2").when(op < 9, "UpdateRowsEventV2")
            .otherwise("DeleteRowsEventV2").as("eventType"),
          lit("mysql-bin.000001").as("binlogFile"),
          col("doc_id").as("binlogPosition"),
          lit("corpus").as("database"), lit("docs").as("table"),
          array(lit("pk"), lit("lang"), lit("n_chars"), lit("text")).as("colNames"),
          when(op >= 6 && op < 9, array(before, after))
            .otherwise(array(after)).as("rows"))).as("value"))
        .write.mode("overwrite").text(src)
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(src))
      try st.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("part-"))
        .sortBy(_.getFileName.toString).zipWithIndex
        .foreach { case (p, i) =>
          java.nio.file.Files.move(p, p.resolveSibling(f"changes-$i%05d.jsonl")) }
      finally st.close()
      val cfg = Config.parse("""{"serverId":"q87","dbTables":{"corpus":["docs"]}}""")
      val t0 = System.nanoTime()
      require(CdcPipeline.land(s, cfg, src, ckpt, out).awaitTermination(600000),
        "q87 landing stream did not complete")
      landingElapsedSec = Some((System.nanoTime() - t0) / 1e9)
      landedLakes.put((s, d), out)
      out
    }}

  /** Build ONCE per (session, dataset) the q88 snapshot: compact the
    * q87 lake up to its midpoint offset, so the q88 read genuinely
    * exercises BOTH legs — snapshot for the first half of the change
    * history, delta merge for the second. Returns (snapshotDir,
    * cutoff). The midpoint (max position / 2) is a 1-row agg on the
    * lake — one-time setup, like the landing job itself. */
  private def snapshotOfLake(s: SparkSession, d: String): (String, Long) =
    lakeSnapshots.synchronized { Option(lakeSnapshots.get((s, d))).getOrElse {
      val lake = landedDocsLake(s, d)
      val cutoff = s.read.parquet(lake)
        .agg(max(col("binlog_position"))).head().getLong(0) / 2
      val snapDir = java.nio.file.Files.createTempDirectory("graft-q88").toString
      val t0 = System.nanoTime()
      CdcPipeline.compact(s, lake, snapDir, "corpus", "docs", "pk",
        upTo = Some(("mysql-bin.000001", cutoff)))
      compactElapsedSec = Some((System.nanoTime() - t0) / 1e9)
      lakeSnapshots.put((s, d), (snapDir, cutoff))
      (snapDir, cutoff)
    }}

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B25: tumbling 1-hour event-time window (epoch-aligned, so it equals
    // date_trunc('hour')). Streaming form adds withWatermark — same result
    // on in-order replay.
    "q25_tumbling_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dec(sum(dec(col("value")))).cast("double").as("sum_value"))
        .select(tss(col("w.start")).as("win_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // B26: session windows (30-min gap) via the portable window
    // formulation: flag gap>30min, running-sum the flags into session ids.
    // (session_window() itself is exercised in StreamingSpec.)
    "q26_session_window" -> ((s, d) => {
      val w1 = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val g = Tables.events(s, d)
        .withColumn("new_s",
          when(col("ts") - lag(col("ts"), 1).over(w1) > GapNs, 1).otherwise(0))
      g.withColumn("sid", sum(col("new_s")).over(
          w1.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ns"), max(col("ts")).as("end_ns"))
        .select(col("user_id"), col("sid"), col("n_events"),
          nsToStr(col("start_ns")).as("session_start"),
          nsToStr(col("end_ns")).as("session_end"))
        .orderBy(col("user_id"), col("sid"))
    }),

    // B27: stateful dedup twin — keep min event_id per (user_id,
    // event_type, ts). Streaming form is dropDuplicatesWithinWatermark.
    "q27_dedup" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"), col("ts"))
        .agg(min(col("event_id")).as("event_id"))
        .select(col("user_id"), col("event_type"), nsToStr(col("ts")).as("ts_s"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"), col("ts"))),

    // B28: CDC routing parity as a query — synthetic change stream derived
    // from orders, route op-filter + portable hash bucketing (o_orderkey%3;
    // Murmur3-vs-FNV balance parity is a unit-test concern, ShardingSpec).
    "q28_cdc_routing" -> ((s, d) => {
      val changes = Tables.orders(s, d).select(
        col("o_orderkey").as("pk"),
        when(col("o_orderkey") % 10 < 6, "INSERT")
          .when(col("o_orderkey") % 10 < 9, "UPDATE")
          .otherwise("DELETE").as("operation"),
        lit("shop").as("database"), lit("orders").as("tbl"))
      changes
        .filter(col("operation").isin("INSERT", "UPDATE") &&
          concat_ws(".", col("database"), col("tbl")) === "shop.orders")
        .groupBy(col("operation"), pmod(col("pk"), lit(3)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("operation"), col("bucket"))
    }),

    // Stream-stream interval join, batch twin (the streaming form — two
    // watermarked streams joined on key + time range — is
    // StreamingSpec's interval-join test): per purchase, clicks of the
    // same user in the preceding 30 minutes.
    //
    // r13 shape: both join sides came from the SAME events table, so
    // the range join IS a per-user range-frame count — ONE scan and ONE
    // exchange (partitionBy user, sort ts) with a conditional count
    // over RANGE [-GapNs, -1], instead of two filtered scans + a
    // left SMJ range join + a re-aggregation. CostProbe r13: 0.357 s
    // window vs 0.435 s join at the 10× corpus, answers row-identical
    // (the [pts-Gap, pts) predicate maps exactly to the inclusive
    // integer-ns frame bounds [-GapNs, -1]). At 100 TB the shape is the
    // same co-located per-user sort the SMJ needed, minus one exchange
    // and one scan. The oracle keeps the textbook two-sided join SQL.
    //
    // Join-parity edge cases (ADVICE r13): a NULL user_id would form
    // its own window partition (the join's === matches nothing), so
    // NULL users are filtered up front — a free codegen row filter
    // that restores the join semantics exactly. Duplicate purchase
    // rows with identical (user_id, event_id, ts) would emit one row
    // each where the old groupBy collapsed them; event_id is unique
    // per event row in this table (and in any sane event log), so no
    // dedup exchange is spent on it — assumption documented here.
    "q61_interval_join" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-GapNs, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .where(col("user_id").isNotNull)
        .withColumn("n_clicks",
          count(when(col("event_type") === "click", 1)).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          nsToStr(col("ts")).as("ts_s"), col("n_clicks"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // CDC state materialization (the step after routing in a CDC engine:
    // change stream → current-state table). Synthetic per-key change
    // sequence from orders (pk = custkey, version = orderkey); the
    // latest version wins, a last-op DELETE removes the key. One window
    // shuffle on pk — at 100 TB this is the standard merge-on-read
    // compaction shape (foreachBatch MERGE in the streaming form).
    "q62_cdc_latest" -> ((s, d) => {
      val changes = Tables.orders(s, d).select(
        col("o_custkey").as("pk"), col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 < 6, "INSERT")
          .when(col("o_orderkey") % 10 < 9, "UPDATE")
          .otherwise("DELETE").as("operation"),
        col("o_totalprice").as("val"))
      val w = Window.partitionBy(col("pk")).orderBy(col("seq").desc)
      changes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("operation") =!= "DELETE")
        .select(col("pk"), col("seq").as("last_seq"), col("operation"),
          decD(decFix(col("val"), 2)).as("val"))
        .orderBy(col("pk"))
    }),

    // Source→lake→operator COMPOSITION (the engine's production shape,
    // end-to-end): synthetic binlog change stream → binlog-replay source
    // → Decode → CdcPipeline.land (streaming file sink, exactly-once) →
    // liftLanded typed read → current-state materialization (q62's
    // window) → text-quality operator (B29's tokenizer) over the live
    // rows, aggregated per quality band. The oracle computes the same
    // algebra straight from `orders` — any drift anywhere in the
    // capture path (JSON decode, after-image elimination, landing
    // schema, lift casts, state merge) breaks the hash.
    // Scale: the lake is (database, table)-partitioned parquet; the
    // state merge shuffles once on pk (merge-on-read compaction shape);
    // the quality pass is a narrow map — same plan at 1000 executors.
    "q87_cdc_landed_quality" -> ((s, d) => {
      val landed = s.read.parquet(landedDocsLake(s, d))
      val lifted = CdcPipeline.liftLanded(landed, "corpus", "docs", docsLiftSchema)
      val w = Window.partitionBy(col("pk")).orderBy(col("binlog_position").desc)
      val state = lifted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("operation") =!= "DELETE")
      qualityBands(state)
    }),

    // Compacted current-state read (the r7 verdict's scale gap): the
    // SAME algebra as q87 — and the same oracle, computed from full
    // history — but served from CdcPipeline.compact's snapshot (first
    // half of the change log, latest-wins pre-applied) merged with only
    // the post-snapshot delta. Any drift in the snapshot write, the
    // high-water bookkeeping, the delta pruning predicate, or the
    // incremental merge breaks the hash against the full-history twin.
    // Scale: read cost is O(live rows + delta), not O(history); the
    // delta range filter pushes into the lake scan (PlanSpec pin).
    "q88_cdc_compacted_state" -> ((s, d) => {
      val (snapDir, _) = snapshotOfLake(s, d)
      val state = CdcPipeline.readCurrentState(
        s, landedDocsLake(s, d), snapDir, "corpus", "docs", docsLiftSchema)
      qualityBands(state)
    }),

    // INCREMENTAL changepoint over the compacted CDC lake (round 10):
    // the monitoring loop a 100 TB deployment actually runs — detect
    // level shifts on the LANDED current state without rescanning
    // history. Composes the q88 snapshot+delta read (read cost is
    // O(live rows + delta), not O(history)) with q131's CUSUM split:
    // per-lang live-document counts over pk strides, argmax_k
    // |n·S_k − k·S_n| in BIGINT-closed algebra. The oracle recomputes
    // the IDENTICAL statistic from the full change history in DuckDB,
    // so the hash compare proves snapshot+delta ≡ from-scratch through
    // the entire capture path AND the changepoint algebra (the
    // q88/q127 store≡scratch discipline).
    "q132_changepoint_incremental" -> ((s, d) => {
      val (snapDir, _) = snapshotOfLake(s, d)
      val state = CdcPipeline.readCurrentState(
        s, landedDocsLake(s, d), snapDir, "corpus", "docs", docsLiftSchema)
      val counts = state
        .groupBy(col("lang"), expr("pk div 16").as("bkt"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Changepoint.split(counts, "lang", "bkt", "n")
        .select(col("lang"), col("cp_bucket").as("cp_bkt"),
          col("d_stat"), col("n_buckets"))
        .orderBy(col("lang"))
    })
  )

  private val docsLiftSchema = StructType(Seq(
    StructField("pk", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType), StructField("text", StringType)))

  /** The q87/q88 text-quality aggregation over a current-state table
    * (B29's tokenizer, banded) — shared so the full-history and
    * snapshot+delta reads are compared under the IDENTICAL consumer. */
  private def qualityBands(state: DataFrame): DataFrame =
    state
      .withColumn("tok_n",
        size(filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "")).cast("long"))
      .withColumn("len", length(col("text")).cast("long"))
      .filter(col("tok_n") >= 8)
      .groupBy(col("lang"), floor(col("tok_n") / lit(32.0)).cast("long").as("band"))
      .agg(count(lit(1)).as("n"), big(sum(col("len"))).as("sum_len"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        big(sum(col("n_chars"))).as("sum_chars"))
      .orderBy(col("lang"), col("band"))

  override def oracle: Map[String, String] = Map(
    "q25_tumbling_window" ->
      s"""SELECT strftime(date_trunc('hour', ts), $TS) AS win_start, event_type,
         |       COUNT(*) AS n,
         |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q26_session_window" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts,
         |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
         |  FROM g)
         |SELECT user_id, sid, COUNT(*) AS n_events,
         |       strftime(MIN(ts), $TS) AS session_start,
         |       strftime(MAX(ts), $TS) AS session_end
         |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,

    "q27_dedup" ->
      s"""SELECT user_id, event_type, strftime(ts, $TS) AS ts_s,
         |       MIN(event_id) AS event_id
         |FROM events GROUP BY user_id, event_type, ts
         |ORDER BY user_id, event_type, ts""".stripMargin,

    "q28_cdc_routing" ->
      """WITH changes AS (
        |  SELECT o_orderkey AS pk,
        |         CASE WHEN o_orderkey % 10 < 6 THEN 'INSERT'
        |              WHEN o_orderkey % 10 < 9 THEN 'UPDATE'
        |              ELSE 'DELETE' END AS operation,
        |         'shop' AS db, 'orders' AS tbl
        |  FROM orders)
        |SELECT operation, CAST(pk % 3 AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM changes
        |WHERE operation IN ('INSERT','UPDATE') AND concat_ws('.', db, tbl) = 'shop.orders'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q61_interval_join" ->
      s"""SELECT p.user_id, p.event_id, strftime(p.ts, $TS) AS ts_s,
         |       CAST(COUNT(c.ts) AS BIGINT) AS n_clicks
         |FROM events p LEFT JOIN events c
         |  ON c.user_id = p.user_id AND c.event_type = 'click'
         | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
         |WHERE p.event_type = 'purchase'
         |GROUP BY p.user_id, p.event_id, p.ts
         |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q62_cdc_latest" ->
      """WITH changes AS (
        |  SELECT o_custkey AS pk, o_orderkey AS seq,
        |         CASE WHEN o_orderkey % 10 < 6 THEN 'INSERT'
        |              WHEN o_orderkey % 10 < 9 THEN 'UPDATE'
        |              ELSE 'DELETE' END AS operation,
        |         o_totalprice AS val
        |  FROM orders),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
        |      FROM changes)
        |SELECT pk, seq AS last_seq, operation,
        |       CAST(CAST(CAST(val AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS DOUBLE) AS val
        |FROM r WHERE rn = 1 AND operation <> 'DELETE'
        |ORDER BY pk""".stripMargin,

    // Every column rode the wire as strings inside the landed rows_json
    // and was lifted back via declared casts (pk/n_chars long), so the
    // oracle's direct typed view over `documents` is value-identical.
    // q88 reads the same state via snapshot+delta, so the SAME
    // full-history twin must hash-match it too.
    "q88_cdc_compacted_state" -> q87OracleSql,
    "q87_cdc_landed_quality" -> q87OracleSql,

    // Full-history recompute of q132's statistic: same synthetic change
    // stream, latest-wins state, then the q131 CUSUM algebra — every
    // intermediate a BIGINT.
    "q132_changepoint_incremental" ->
      """WITH changes AS (
        |  SELECT doc_id // 3 AS pk, doc_id AS seq,
        |         CASE WHEN doc_id % 10 < 6 THEN 'INSERT'
        |              WHEN doc_id % 10 < 9 THEN 'UPDATE'
        |              ELSE 'DELETE' END AS operation,
        |         lang
        |  FROM documents),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
        |      FROM changes),
        |state AS (SELECT * FROM r WHERE rn = 1 AND operation <> 'DELETE'),
        |hc AS (SELECT lang, pk // 16 AS bkt, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM state GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, bkt,
        |         SUM(n) OVER wp AS sk,
        |         CAST(COUNT(*) OVER wp AS BIGINT) AS k,
        |         SUM(n) OVER wt AS sn,
        |         CAST(COUNT(*) OVER wt AS BIGINT) AS nn
        |  FROM hc
        |  WINDOW wp AS (PARTITION BY lang ORDER BY bkt
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wt AS (PARTITION BY lang)),
        |d AS (
        |  SELECT lang, bkt, CAST(abs(nn * sk - k * sn) AS BIGINT) AS d_stat,
        |         nn AS n_buckets,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY abs(nn * sk - k * sn) DESC, bkt) AS rn
        |  FROM sc)
        |SELECT lang, bkt AS cp_bkt, d_stat, n_buckets
        |FROM d WHERE rn = 1 ORDER BY lang""".stripMargin
  )

  private val q87OracleSql: String =
    """WITH changes AS (
      |  SELECT doc_id // 3 AS pk, doc_id AS seq,
      |         CASE WHEN doc_id % 10 < 6 THEN 'INSERT'
      |              WHEN doc_id % 10 < 9 THEN 'UPDATE'
      |              ELSE 'DELETE' END AS operation,
      |         lang, CAST(n_chars AS BIGINT) AS n_chars, text
      |  FROM documents),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
      |      FROM changes),
      |state AS (SELECT * FROM r WHERE rn = 1 AND operation <> 'DELETE'),
      |q AS (SELECT pk, lang, n_chars, CAST(length(text) AS BIGINT) AS len,
      |             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |                  x -> x <> '')) AS BIGINT) AS tok_n
      |      FROM state)
      |SELECT lang, CAST(floor(tok_n / 32.0) AS BIGINT) AS band,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(len) AS BIGINT) AS sum_len,
      |       MIN(pk) AS min_pk, MAX(pk) AS max_pk,
      |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM q WHERE tok_n >= 8 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
