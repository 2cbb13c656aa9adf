package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — "what changed between dataset version A and
  * version B": the regression gate a training-data pipeline runs before
  * promoting a refreshed corpus (row added / deleted / changed /
  * unchanged, with per-class accounting), and the batch analog of a CDC
  * feed (the classes ARE insert/delete/update events).
  *
  * Shape: ONE full outer join on the key, with each side pre-reduced
  * to (key, fingerprint). The fingerprint (r13) is a NATIVE xxhash64
  * chain over the sorted non-key columns, each prefixed by its
  * null-flag — no string materialization at all. The flag stream makes
  * the hash's contribution sequence uniquely decodable: xxhash64 skips
  * NULL inputs (leaving the accumulator unchanged), so without flags
  * (x, NULL) and (NULL, x) would alias; with a flag before every value
  * the decoder always knows whether a value follows, so no two distinct
  * null-pattern/value combinations feed the same input stream. This
  * replaced the r12 rendered-string FNV form (cast-to-string + length
  * prefix + concat) after the DiffProbe A/B showed the render WAS the
  * cost: at the 10× corpus the fingerprint pass dropped 0.62 → 0.21 s
  * and the whole diff 1.10 → 0.53 s (BASELINE.md r13 ledger; the
  * union+single-exchange pivot variant was also measured and lost to
  * the join shape, 0.63 vs 0.53 s). Only 16-byte rows ever shuffle,
  * never payloads; the join key is the table's primary key, so both
  * sides hash-partition evenly (no skew by construction) and at 100 TB
  * the diff is exactly two scans + one co-partitioned join.
  */
object TableDiff {

  private def fingerprint(df: DataFrame, keyCol: String): DataFrame = {
    val payload = df.columns.filter(_ != keyCol).sorted.flatMap { c =>
      Seq(col(c).isNull.cast("int"), col(c))
    }
    df.select(col(keyCol).as("k"),
      xxhash64(payload.toIndexedSeq: _*).as("fp"))
  }

  /** @return (k, status) with status ∈ added | deleted | changed |
    *         unchanged — `added` means present only in `newer`.
    *
    * The two fingerprint sides repartition to defaultParallelism on the
    * key before the full-outer join (r12): the join is this operator's
    * only real exchange and must not inherit a session's small-query
    * shuffle width — same exchange count (HashPartitioning(k, p)
    * satisfies the join's distribution), 4-8× the reduce width at
    * volume. */
  def diff(older: DataFrame, newer: DataFrame, keyCol: String): DataFrame = {
    val p = older.sparkSession.sparkContext.defaultParallelism
    val a = fingerprint(older, keyCol).withColumnRenamed("fp", "fp_old")
      .repartition(p, col("k"))
    val b = fingerprint(newer, keyCol).withColumnRenamed("fp", "fp_new")
      .repartition(p, col("k"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("deleted"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The diff as a CDC batch: only the non-`unchanged` rows, each
    * upsert carrying its FULL new-side payload (deletes carry the key
    * alone) — exactly the event stream a MERGE INTO consumes. Payload
    * columns keep `newer`'s names; `__op` is the change class. */
  def changeSet(older: DataFrame, newer: DataFrame,
      keyCol: String): DataFrame = {
    val d = diff(older, newer, keyCol).filter(col("status") =!= "unchanged")
    // payload side renamed wholesale: `d` derives from `newer`, so a
    // direct join would be an ambiguous self-join
    val payloadCols = newer.columns.filter(_ != keyCol).toIndexedSeq
    val payload = newer.select(col(keyCol).as("__ck") +:
      payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    d.join(payload, col("k") === col("__ck"), "left")
      .select(col("k") +: col("status").as("__op") +:
        payloadCols.map(c => col(s"__p_$c").as(c)): _*)
  }

  /** MERGE INTO semantics: apply a [[changeSet]] batch to the old
    * snapshot — drop deleted+changed keys, append added+changed
    * payloads. The round-trip law `applyChanges(older,
    * changeSet(older, newer)) ≡ newer` (row multiset equality) is the
    * correctness contract a CDC landing zone runs on, spec-pinned and
    * hash-gated end-to-end by q149. */
  def applyChanges(older: DataFrame, changes: DataFrame,
      keyCol: String): DataFrame = {
    val survivors = older.join(
      changes.select(col("k").as(keyCol)), Seq(keyCol), "left_anti")
    val upserts = changes.filter(col("__op") =!= "deleted")
      .select(col("k").as(keyCol) +:
        older.columns.filter(_ != keyCol).map(col).toIndexedSeq: _*)
    survivors.unionByName(upserts)
  }
}
