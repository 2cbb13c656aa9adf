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

  // Resolved-relation cache, keyed per session instance: repeated reads
  // of the same table reuse the listed FileIndex + parquet schema instead
  // of re-listing and re-reading footers per query — exactly what a
  // catalog/metastore table provides. DataFrames are immutable plans, so
  // sharing is safe; keying on the session identity keeps plans from a
  // stopped session from leaking into a new one.
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    relationCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark only reads as a
    * raw long via the legacy nanosAsLong conf. We keep the long (`ts` —
    * exact, used for ordering/grouping/gap arithmetic) and derive `ts_t`,
    * a micro-truncated timestamp for event-time windowing.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    relationCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, "events+ts_t"),
      _ => {
        try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        catch { case _: Throwable => () }
        t(spark, dir, "events")
          .withColumn("ts_t", timestamp_micros((col("ts") / 1000L).cast("long")))
      })

  /** Spread a CPU-heavy per-row pipeline across all cores. The fixture
    * parquet files are single-row-group (scan = ONE task), so without
    * this every downstream regex/HOF runs single-threaded; at 100 TB the
    * scan has thousands of row-group splits and this round-robin
    * repartition is a cheap no-op-sized shuffle relative to the per-row
    * work it parallelizes (only use it in front of compute-bound maps).
    */
  def spread(df: DataFrame): DataFrame = df.repartition(32)

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
