package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the mergeable heavy-hitter / frequency sketch
  * (Cormode & Muthukrishnan 2005) for "how often does key x occur" over
  * corpora too large to hold an exact per-key table.
  *
  * The sketch is a depth×width grid of counters: each input row
  * increments one cell per sketch row at column h_r(key); the estimate
  * for a key is the MIN over its depth cells. Estimates never
  * undercount (every cell an x hashes to holds at least x's true
  * total) and overcount by at most ε·N with probability 1−δ for
  * width = e/ε, depth = ln(1/δ) — the classic one-sided guarantee.
  *
  * Scale shape (the reason to sketch at all): the grid is
  * depth·width counters REGARDLESS of corpus size or key cardinality.
  * [[build]] is one hash aggregation whose map-side partial collapse
  * bounds every task's output at depth·width cells, so the shuffle is
  * sketch-sized, not data-sized; grids from different shards/days merge
  * by cell-wise addition ([[merge]] — sum is associative/commutative),
  * which is what makes the sketch an incremental-maintenance structure
  * like the q101 band profile: append a delta's sketch, never rescan
  * the corpus.
  *
  * Hashing is the textbook universal family h_r(x) = ((a_r·x + b_r)
  * mod p) mod width with p = 2^31−1 and fixed odd prime a_r, b_r per
  * row — pure integer algebra, bit-identical in any engine (the DuckDB
  * oracle twin recomputes it verbatim), no library hash dependence.
  * Keys reduce mod p first so a_r·(x mod p) < 2^58 never overflows
  * BIGINT even for 63-bit keys; negative keys are pmod-folded (callers
  * mirroring the math in plain `%` SQL must keep keys non-negative or
  * spell pmod explicitly — the q92 convention).
  */
object CountMin {

  /** Mersenne prime 2^31 − 1: mod-p stays in 31 bits, so a·(x mod p)
    * fits comfortably in a 64-bit signed long for any a below 2^32. */
  val P = 2147483647L

  /** Fixed per-row universal-hash parameters (a, b) — four rows
    * (δ = e^-4 ≈ 1.8%), primes well below 2^27 so the product bound in
    * the scaladoc holds with margin. Fixed constants, not a seeded
    * RNG: the sketch must be reproducible across engines and runs for
    * the oracle twin and for merging sketches built by different jobs
    * (two sketches only merge if their hash family is identical). */
  val RowParams: Seq[(Long, Long)] = Seq(
    (1299709L, 104729L),
    (15485863L, 1299721L),
    (49979687L, 15485867L),
    (86028157L, 49979693L))

  /** Column of the sketch column index h_r(key) for one row's (a, b). */
  private def cellOf(key: Column, a: Long, b: Long, width: Int): Column =
    ((lit(a) * pmod(key, lit(P)) + lit(b)) % P % width).cast("int")

  private def cells(key: Column, width: Int): Column =
    array(RowParams.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), cellOf(key, a, b, width).as("c"))
    }: _*)

  /** Build the sketch grid over `df`: one (r, c, cnt) row per non-empty
    * cell (≤ depth·width rows total). `weight` is the per-input-row
    * increment — `lit(1L)` counts occurrences; a token count or byte
    * size gives a weighted frequency sketch. The explode multiplies
    * rows ×depth BEFORE the aggregation, but the hash aggregate's
    * map-side partial collapse caps each task's shuffle output at
    * depth·width cells, so the wide stage moves a sketch, not a corpus. */
  def build(df: DataFrame, key: Column, weight: Column, width: Int = 512): DataFrame =
    df.select(explode(cells(key, width)).as("rc"), weight.cast("long").as("w"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(sum(col("w")).as("cnt"))

  /** Cell-wise merge of sketches built with the same width (and, by
    * construction, the same fixed hash family) — the shard/day/delta
    * combine step. Estimates from the merged grid equal estimates from
    * a single build over the concatenated inputs (sum is associative). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `keys`: min over the key's depth cells,
    * appended as `cm_est` to the key DataFrame's columns. The sketch is
    * depth·width rows — broadcast by construction, so probing any
    * number of keys is a narrow map-side join (no shuffle of the key
    * side). A key hashing to an untouched cell estimates 0 (left join +
    * coalesce), the correct floor for a key the sketch never saw. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int = 512): DataFrame = {
    val kcols = keys.columns.toSeq.map(col)
    keys.select(kcols :+ explode(cells(col(keyCol), width)).as("p"): _*)
      .join(broadcast(sketch),
        col("p.r") === col("r") && col("p.c") === col("c"), "left")
      .groupBy(kcols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }
}
