package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the entity-resolution join:
  * "which records refer to the same real-world thing under typos /
  * variant spellings". The naive form is an all-pairs Levenshtein scan,
  * O(n²) string DPs — never viable past a few thousand rows. This
  * operator is the standard blocking decomposition (Fellegi-Sunter /
  * record-linkage practice):
  *
  *  1. DEDUPLICATE the match text first: identical strings collapse to
  *     one representative (with their row count), so the pair stage
  *     works on distinct values — on real corpora orders of magnitude
  *     smaller than rows (a name seen 10^6 times costs 10^6 pair DPs
  *     naively, one here).
  *  2. BLOCK by a caller-chosen key (a rare token, a phonetic code, a
  *     sorted-q-gram signature): candidate pairs come ONLY from an
  *     equality self-join on the block key — a hash-partitioned join,
  *     never a cross product. Recall is the blocking function's
  *     business (a pair split across blocks is unseen, the documented
  *     trade of every blocking scheme); precision is exact.
  *  3. PRUNE inside the join before any DP: |len(a) − len(b)| ≤ maxDist
  *     is a correct lower bound on edit distance, evaluated from two
  *     already-materialized ints. Survivors run the real
  *     `levenshtein` (Spark's built-in codegen DP).
  *  4. GUARD the block histogram: any block holding more than
  *     `maxBlockRows` distinct values refuses loudly (the nearDupPairs
  *     contract — pair work is |block|², and a degenerate key like ''
  *     must fail, not quietly go quadratic). The guard is a 1-row
  *     aggregate over the deduplicated (not raw) values.
  *
  * At 100 TB: the dedup and the block join shuffle on value-hash /
  * block key respectively — both bounded, both AQE-skew-splittable;
  * the DP runs only on length-pruned within-block pairs.
  */
object FuzzyJoin {

  /** All within-block pairs of DISTINCT `textCol` values at edit
    * distance ≤ maxDist, for a self-match over `df`.
    *
    * `blockKey` maps the text column to its blocking key (e.g.
    * `regexp_extract(_, "([a-z]+)$", 1)` for last-token blocking).
    * Output: (name_a, name_b, dist, n_a, n_b) with name_a < name_b —
    * n_* are the collapsed row counts, so downstream resolution can
    * weigh clusters without rejoining the corpus. */
  def selfEditPairs(df: DataFrame, textCol: String,
      blockKey: Column => Column, maxDist: Int,
      maxBlockRows: Long = 10000L): DataFrame = {
    val vals = df.groupBy(col(textCol).as("__t"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__bk", blockKey(col("__t")))
      .localCheckpoint(eager = true)
    val hot = vals.groupBy(col("__bk")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxBlockRows)
      .orderBy(col("__c").desc).limit(1).collect()
    require(hot.isEmpty,
      s"selfEditPairs: block '${if (hot.nonEmpty) hot.head.get(0) else ""}' holds " +
        s"${if (hot.nonEmpty) hot.head.getLong(1) else 0L} distinct values " +
        s"(> maxBlockRows = $maxBlockRows) — pair work is |block|^2; choose a " +
        "more selective blocking key or raise the bound deliberately")
    val l = vals.select(col("__bk"), col("__t").as("name_a"), col("__n").as("n_a"))
    val r = vals.select(col("__bk").as("__bk2"), col("__t").as("name_b"),
      col("__n").as("n_b"))
    l.join(r, col("__bk") === col("__bk2") && col("name_a") < col("name_b"))
      // length prune first: |Δlen| is a lower bound on edit distance,
      // and it reads two ints where the DP reads O(len²) cells
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // materialize the DP result once — filtering on the projected
      // column keeps a single levenshtein evaluation per surviving pair
      // (the DP is the dominant O(len²) cost of the survivor stream)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }
}
