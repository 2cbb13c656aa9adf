package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry over the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every accessor returns the raw
  * `spark.read.parquet` scan so Catalyst can push filters/projections into
  * the `FileSourceScanExec` (verified via `.explain` — `PushedFilters` /
  * `ReadSchema`). No caching, no collect: at 1000 executors the scan
  * parallelism comes from parquet row-group splits
  * (`spark.sql.files.maxPartitionBytes`).
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
    * whole catalog is insulated from the file-level representation. The
    * session time zone is UTC everywhere (Bench/Verify/tests), so the
    * NTZ→timestamp cast is exact.
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
      val df = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts_t",
            timestamp_micros((col("ts") / 1000L).cast("long")))
        case _ => // TIMESTAMP / TIMESTAMP_NTZ (micros)
          raw.withColumn("ts_t", col("ts").cast("timestamp"))
            .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      }
      m.putIfAbsent(key, df)
      m.get(key)
    }
  }

  /** Spread a CPU-heavy per-row pipeline across all cores. The fixture
    * parquet files are single-row-group (scan = ONE task), so without
    * this every downstream regex/HOF runs single-threaded. A NO-OP when
    * the input already has at least defaultParallelism partitions: at
    * 100 TB the scan's thousands of row-group splits provide the
    * parallelism and a blind repartition would be a pointless extra
    * shuffle. Only use in front of compute-bound maps. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
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
