package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators — the APPLY side of corpus
  * balancing (q84 computes target mixture weights; these execute a
  * downsample). Everything is hash-deterministic: no RNG, no
  * sampling-order dependence, reproducible across engines, runs, and
  * cluster sizes, and a document's keep/drop decision is stable as the
  * corpus grows (the q46 split-assignment property, applied to
  * sampling).
  *
  * Scale shape: [[hashSample]] and [[balancedByGroup]] are pure per-row
  * work plus one tiny per-group dim (broadcast) — no shuffle of the
  * corpus beyond the pre-existing group statistics pass.
  * [[topKByPriority]] is a per-group top-k window, which Spark executes
  * with WindowGroupLimit: partial top-k inside every map task BEFORE
  * the exchange, so the shuffle carries ~k rows per (partition, group),
  * never the corpus.
  */
object Sampling {

  val P = 1000000007L

  /** The portable priority/assignment hash (the q46 split LCG): stays
    * in BIGINT for any non-negative id; fractional-rate comparisons use
    * its residue mod 10^6 (parts-per-million). */
  def priorityHash(id: Column): Column = ((id % P) * 40503L + 17L) % P

  /** Deterministic Bernoulli-by-hash: keep a row iff its id's hash
    * residue (ppm) falls under `rate1e6`. rate is parts-per-million, so
    * integer algebra decides every row — engine-portable. */
  def hashSample(df: DataFrame, idCol: String, rate1e6: Column): DataFrame =
    df.filter(priorityHash(col(idCol)) % 1000000L < rate1e6)

  /** Per-group balanced keep rates: (group, n, rate_1e6) with
    * rate = floor(min_n · 10^6 / n_group) — the |groups|-sized dim that
    * drives [[balancedByGroup]], exposed so callers can report it. */
  def balancedRates(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    // 1-row min as a broadcast dim (the repo's guard idiom) — never a
    // partition-less window, even over the tiny group dim
    val minn = counts.agg(min(col("n")).as("__minn"))
    counts.crossJoin(broadcast(minn))
      .select(col(groupCol), col("n"),
        floor(col("__minn") * 1000000L / col("n")).cast("long").as("rate_1e6"))
  }

  /** Balanced downsampling to the SMALLEST group via [[balancedRates]]
    * + [[hashSample]]. Returns the kept rows with the input's own
    * columns; kept counts land within integer-rounding of the minimum
    * group. */
  def balancedByGroup(df: DataFrame, groupCol: String,
      idCol: String): DataFrame =
    balancedByGroup(df, groupCol, idCol, balancedRates(df, groupCol))

  /** [[balancedByGroup]] against a PRECOMPUTED rates dim (from
    * [[balancedRates]]) — callers that also report the rates reuse one
    * group-statistics pass instead of paying it twice. */
  def balancedByGroup(df: DataFrame, groupCol: String, idCol: String,
      rates: DataFrame): DataFrame =
    hashSample(
        df.join(broadcast(rates.select(col(groupCol), col("rate_1e6"))), groupCol),
        idCol, col("rate_1e6"))
      .drop("rate_1e6")

  /** Deterministic per-group "reservoir": the k rows with the smallest
    * priority hash in each group (ties by id). Equivalent to a uniform
    * k-sample under a fixed hash ordering, and — unlike a true
    * reservoir — independent of scan order and partitioning. */
  def topKByPriority(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__pri"), col(idCol))
    df.withColumn("__pri", priorityHash(col(idCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .withColumnRenamed("__pri", "priority")
  }
}
