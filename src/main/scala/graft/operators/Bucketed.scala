package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Bucketed-table materialization — the EXCHANGE-FREE join lever: two
  * fact tables bucketed on their join key with the same bucket count
  * sort-merge-join with NO shuffle on either side (the bucket id IS the
  * partitioning, persisted in the file layout + catalog). At 100 TB
  * this converts the recurring join's two full-data exchanges into a
  * one-time layout cost at write time — the single biggest shuffle
  * lever Spark offers for repeated co-keyed joins (the warehouse
  * pattern: land once bucketed, join forever free).
  *
  * `materializeOnce` is session-idempotent: the bucketed table writes
  * on first use (catalog miss) and is served from the catalog + file
  * layout afterwards, so a bench's warm runs — and every downstream
  * query in the session — pay zero re-layout (the ProfileStore
  * land-once discipline). Table data lives under /tmp/graft_bucketed,
  * name-suffixed by the source so different scale factors can't
  * collide. BucketedJoinSpec pins the join plan: zero `Exchange`
  * operators between the bucketed scans and the SortMergeJoin.
  */
object Bucketed {

  /** Write `df` as a `buckets`-bucket parquet table clustered+sorted on
    * `key` (first call in the session only), and return the catalog
    * read — the side that joins exchange-free. */
  def materializeOnce(df: DataFrame, table: String, key: String,
      buckets: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      df.write.format("parquet")
        .mode(SaveMode.Overwrite)
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", s"/tmp/graft_bucketed/$table")
        .saveAsTable(table)
    }
    spark.table(table)
  }

  /** Deterministic identifier-safe suffix for a source directory, so
    * per-SF tables can't collide in one warehouse. */
  def suffixFor(dir: String): String = {
    var h = 0xcbf29ce484222325L
    dir.foreach { ch => h ^= ch.toLong; h *= 0x100000001b3L }
    java.lang.Long.toHexString(h)
  }

  /** Exchange-free inner equi-join of two co-bucketed sides. */
  def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String): DataFrame =
    left.join(right, col(leftKey) === col(rightKey))
}
