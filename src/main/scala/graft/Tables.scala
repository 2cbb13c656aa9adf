package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry over the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every plain accessor returns the raw
  * `spark.read.parquet` scan so Catalyst can push filters/projections into
  * the `FileSourceScanExec` (verified via `.explain` — `PushedFilters` /
  * `ReadSchema`); the one exception is [[events]], a normalizing adapter
  * whose pushdown trade-offs are documented on it. No caching, no
  * collect: at 1000 executors the scan parallelism comes from parquet
  * row-group splits (`spark.sql.files.maxPartitionBytes`).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache, keyed on the session INSTANCE: repeated
  // reads of the same table reuse the listed FileIndex + parquet schema
  // instead of re-listing and re-reading footers per query — exactly what
  // a catalog/metastore table provides. DataFrames are immutable plans,
  // so sharing is safe; keying on the instance (reference equality, not
  // identityHashCode, which can collide) means two sessions can never
  // see each other's plans. Bounded LRU over SESSIONS (a weak key would
  // be useless here — the cached DataFrames strongly reference their
  // session, so weak keys never clear): evicting the least-recently-used
  // session past a small cap caps total growth in session-churning JVMs.
  private val relationCache =
    new java.util.LinkedHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[SparkSession,
          java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]): Boolean =
        size() > 8
    }

  private def sessionMap(spark: SparkSession) =
    relationCache.synchronized {
      var m = relationCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        relationCache.put(spark, m)
      }
      m
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionMap(spark).computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  /** Canonical `events` view: `ts` as an epoch-NANOSECOND long (exact,
    * used for ordering/grouping/gap arithmetic throughout the catalog)
    * and `ts_t`, the micro-precision timestamp for event-time windowing.
    *
    * The driver's generated `events.parquet` has shipped `ts` both as
    * parquet TIMESTAMP(NANOS) (readable only as a raw long via the
    * legacy nanosAsLong conf) and as TIMESTAMP(MICROS) (read as a
    * timestamp, NTZ when the footer isn't UTC-adjusted); this adapter
    * normalizes either physical schema to the same logical view, so the
    * whole catalog is insulated from the file-level representation.
    *
    * Exactness contract (both variants produce the SAME ts/ts_t for the
    * same instant, in ANY session time zone):
    *  - NANOS: ts is the raw long; ts_t = timestamp_micros(ts div 1000)
    *    — integral division (Canon.divL), never the double-rounding
    *    `/ 1000` which can be ~128 ns off above 2^53.
    *  - MICROS, UTC-adjusted footer (TIMESTAMP): the column is already
    *    an instant; no time zone involved.
    *  - MICROS, NTZ footer: the wall-clock value is DEFINED as UTC by
    *    the writer. A plain cast would re-interpret it in the session
    *    zone, so the epoch is computed field-wise (unix_date/hour/min/
    *    sec on the NTZ value — all zone-free operations), making the
    *    view correct even in sessions that didn't set UTC.
    *
    * Pushdown note (100 TB): only the NANOS variant keeps `ts` as the
    * raw physical column, so only there do `ts` range filters reach the
    * parquet scan (PushedFilters + row-group min-max skipping). For the
    * MICROS variants both ts and ts_t are derived expressions — a time
    * filter still prunes via the scan's partition columns if the lake
    * is date-partitioned, but row-group skipping on ts is lost. Callers
    * scanning a MICROS-physical lake at scale should filter on the raw
    * `ts` column BEFORE this normalization (t(spark, dir, "events")) or
    * lay the data out date-partitioned.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val m = sessionMap(spark)
    val key = (dir, "events+ts_t")
    // get/put rather than computeIfAbsent: the builder below re-enters
    // the same map via t(), which is illegal inside computeIfAbsent.
    Option(m.get(key)).getOrElse {
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Throwable => () }
      val raw = t(spark, dir, "events")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val df = raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts_t", Canon.nsToMicros(col("ts")))
        case TimestampNTZType =>
          val micros = ntzUtcMicros(col("ts"))
          raw.withColumn("ts_t", timestamp_micros(micros))
            .withColumn("ts", micros * 1000L)
        case _ => // TIMESTAMP (instant; zone-free by construction)
          raw.withColumn("ts_t", col("ts"))
            .withColumn("ts", unix_micros(col("ts")) * 1000L)
      }
      m.putIfAbsent(key, df)
      m.get(key)
    }
  }

  /** Epoch micros of a TIMESTAMP_NTZ wall-clock value interpreted as
    * UTC, independent of spark.sql.session.timeZone: every operation
    * here (date extraction, hour/minute, fractional-second extract) is
    * zone-free on NTZ inputs, unlike a cast to TIMESTAMP which would
    * shift by the session zone. */
  private def ntzUtcMicros(c: Column): Column =
    unix_date(c.cast("date")) * 86400000000L +
      hour(c) * 3600000000L + minute(c) * 60000000L +
      (date_part(lit("SECOND"), c) * 1000000L).cast("long")

  /** Spread a CPU-heavy per-row pipeline across all cores. The fixture
    * parquet files are single-row-group (scan = ONE task), so without
    * this every downstream regex/HOF runs single-threaded. A NO-OP when
    * the input already has at least defaultParallelism partitions: at
    * 100 TB the scan's thousands of row-group splits provide the
    * parallelism and a blind repartition would be a pointless extra
    * shuffle. Only use in front of compute-bound maps.
    *
    * The partition count comes from plan metadata (FileIndex split math
    * / existing-RDD count — Bridge.sourcePartitionEstimate), not
    * `df.rdd`, which would whole-stage-compile a physical plan that the
    * repartitioned branch immediately discards (r7 advisory). The exact
    * physical count is the fallback for plan shapes the estimator
    * doesn't recognize (none among current call sites). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = org.apache.spark.sql.graftbridge.Bridge.sourcePartitionEstimate(df)
      .getOrElse(df.rdd.getNumPartitions.toLong)
    if (parts >= target) df else df.repartition(target)
  }

  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
