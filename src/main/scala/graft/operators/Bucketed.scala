package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * land-once discipline). Staleness + collision discipline (r11
  * ADVICE): table names should carry [[contentSuffix]] — a fingerprint
  * of the SOURCE's file statuses (path, length, mtime) — so a source
  * that changes in place yields a different table name instead of
  * silently serving the stale layout; the warehouse root is
  * per-OS-user by default and configurable via
  * `spark.graft.bucketed.dir` so shared-host /tmp can't collide.
  * BucketedJoinSpec pins the join plan: zero `Exchange` operators
  * between the bucketed scans and the SortMergeJoin.
  */
object Bucketed {

  /** Warehouse root for bucketed tables: `spark.graft.bucketed.dir` if
    * set, else a per-OS-user directory under java.io.tmpdir. */
  def warehouseDir(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.bucketed.dir").getOrElse {
      val tmp = System.getProperty("java.io.tmpdir", "/tmp")
      val user = System.getProperty("user.name", "anon")
        .replaceAll("[^A-Za-z0-9_.-]", "_")
      s"$tmp/graft_bucketed_$user"
    }

  /** Write `df` as a `buckets`-bucket parquet table clustered+sorted on
    * `key` (first call in the session only), and return the catalog
    * read — the side that joins exchange-free.
    *
    * Stale-generation GC (r12 ADVICE, narrowed r13): suffix-named tables
    * fingerprint the SOURCE, so every in-place source rewrite lands a
    * NEW table name while the previous generation's data dir would
    * otherwise live in the warehouse forever. Before landing a fresh
    * layout, prior `<family>_<pathHex>_<contentHex>` generations sharing
    * BOTH the family and the source-path hash are dropped from the
    * catalog and deleted from disk — the warehouse holds one generation
    * per (family, source path). The path hash is part of the match key
    * (r13 ADVICE fix): [[contentSuffix]] emits `<pathHex>_<contentHex>`,
    * so per-SF tables of the same family live in DIFFERENT GC scopes and
    * landing one SF's table can never delete another SF's. Names with a
    * single hex segment (e.g. [[suffixFor]]) are never GC'd — a pure
    * path hash never goes stale, so there is nothing to collect. */
  def materializeOnce(df: DataFrame, table: String, key: String,
      buckets: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      dropStaleGenerations(spark, table)
      df.write.format("parquet")
        .mode(SaveMode.Overwrite)
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", s"${warehouseDir(spark)}/$table")
        .saveAsTable(table)
    }
    spark.table(table)
  }

  /** Delete prior generations of `table`'s (family, source path) — same
    * name up to the last `_`, INCLUDING the path-hash segment, different
    * content-hash suffix — catalog entry and data dir both. Matches only
    * the two-hex-segment `<family>_<pathHex>_<contentHex>` shape that
    * [[contentSuffix]] produces; single-hex-suffix names ([[suffixFor]])
    * and arbitrary names are never collected, so tables fingerprinting a
    * DIFFERENT source directory are structurally out of scope.
    *
    * Non-migration note (ADVICE r13): generations landed by the r12-era
    * single-segment content-suffix scheme (`<family>_<contentHex>`) are
    * NOT matched by this two-segment sweep, deliberately — a one-hex
    * name is indistinguishable from a [[suffixFor]] path-hash table, and
    * deleting those would break live per-SF tables. A warehouse that
    * predates the two-segment scheme keeps any stale r12 generations
    * until `DROP TABLE` by hand; fresh warehouses (every test/bench run
    * here uses a per-session warehouse dir) never contain them. */
  private def dropStaleGenerations(spark: SparkSession, table: String): Unit = {
    val cut = table.lastIndexOf('_')
    if (cut <= 0 || !table.substring(cut + 1).matches("[0-9a-f]{1,16}")) return
    val cut2 = table.lastIndexOf('_', cut - 1)
    if (cut2 <= 0 || !table.substring(cut2 + 1, cut).matches("[0-9a-f]{1,16}"))
      return
    val family = table.substring(0, cut) // includes the path-hash segment
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(family) + "_[0-9a-f]{1,16}")
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(warehouseDir(spark))
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name != table && pat.matcher(name).matches()) {
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
        fs.delete(st.getPath, true)
      }
    }
  }

  /** Deterministic identifier-safe suffix for a source directory, so
    * per-SF tables can't collide in one warehouse. Pure path hash —
    * use [[contentSuffix]] when the source could change in place. */
  def suffixFor(dir: String): String =
    java.lang.Long.toHexString(fnv(0xcbf29ce484222325L, dir))

  /** TWO-SEGMENT suffix `<pathHex>_<contentHex>`: the pure path hash
    * ([[suffixFor]]) followed by a hash of the source tree's file
    * statuses (FULL path, length, mtime of every file under `dir`). A
    * source that is rewritten in place fingerprints to a different
    * content segment — so [[materializeOnce]] lands a fresh layout
    * instead of serving the stale cached table — while the path segment
    * scopes stale-generation GC to THIS source directory (two SFs of the
    * same family can coexist in one warehouse; r13 ADVICE fix). One
    * recursive listing, no data scan.
    * Order-insensitivity comes from SORTING the per-file hashes before
    * a sequential FNV fold (r11 review fix: a plain XOR fold lets two
    * files with swapped (len, mtime) — or an even number of identical
    * statuses — cancel out, and hashing only the basename missed
    * same-named files moving between subdirectories).
    *
    * Granularity caveat (r12 ADVICE): mtime resolution is the
    * filesystem's — on a coarse-granularity FS a rewrite that preserves
    * every file's length AND lands inside the same mtime tick
    * fingerprints identically and serves the stale layout. Sources that
    * rewrite in place sub-second should version their PATH (new dir per
    * generation), which this fingerprint always catches. */
  def contentSuffix(spark: SparkSession, dir: String): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(hconf)
    var h = fnv(0xcbf29ce484222325L, dir)
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val st = it.next()
        var fh = fnv(0xcbf29ce484222325L, st.getPath.toString)
        fh = fnvLong(fh, st.getLen)
        fh = fnvLong(fh, st.getModificationTime)
        hashes += fh
      }
      hashes.sorted.foreach(fh => h = fnvLong(h, fh))
    }
    s"${suffixFor(dir)}_${java.lang.Long.toHexString(h)}"
  }

  private def fnv(seed: Long, s: String): Long = {
    var h = seed
    s.foreach { ch => h ^= ch.toLong; h *= 0x100000001b3L }
    h
  }

  private def fnvLong(seed: Long, v: Long): Long = {
    var h = seed
    var i = 0
    while (i < 8) { h ^= (v >>> (8 * i)) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Exchange-free inner equi-join of two co-bucketed sides. */
  def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String): DataFrame =
    left.join(right, col(leftKey) === col(rightKey))
}
