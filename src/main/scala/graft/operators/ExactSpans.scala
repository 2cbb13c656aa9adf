package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT repeated-span detection by distributed prefix-doubling — the
  * collision-free completion of the dedup granularity ladder (doc q31 /
  * span-hash q68/q91 / line q137): positions whose verbatim L-token
  * window occurs at least twice in the corpus, with NO hashing anywhere
  * in the decision path.
  *
  * Why this exists next to the rolling-hash span kernel: the span
  * machinery keys spans by a polynomial hash mod 1e9+7 — ~30 bits, so
  * by the birthday bound two DIFFERENT spans collide with 50%
  * probability by ~40 k distinct spans, i.e. CERTAINLY at corpus scale;
  * the hash-keyed operators are honest about being hash-identity
  * semantics. This operator instead computes exact EQUIVALENCE CLASSES
  * of windows by prefix doubling (Manber–Myers suffix-ranking, the
  * ExactSubstr idea of Lee et al. 2022 "Deduplicating Training Data
  * Makes Language Models Better" done Spark-shaped): class(w=1) = the
  * token's vocabulary id; class(2k) = dense id of the pair
  * (class_k(i), class_k(i+k)); a window of arbitrary length L compares
  * via the standard two-anchor overlap (class_a(i), class_a(i+L−a))
  * with a = the largest power of two ≤ L. Every step is exact — the
  * only "hash" is a dense id assigned per distinct pair, which is
  * injective by construction.
  *
  * Class-id assignment is VERIFIED-HASH with an exact fallback: each
  * round's candidate class is xxhash64(c1, c2) computed in-row (no
  * extra shuffle), and ONE aggregation per round PROVES injectivity on
  * this dataset (countDistinct(pair) == countDistinct(hash)); on the
  * astronomically-rare 64-bit collision the round transparently
  * re-runs through sorted dense ids (distinct pairs → range-sorted
  * zipWithIndex — deterministic, fully distributed). Either way the
  * returned classes are EXACT equivalence classes — the hash is an
  * optimization whose correctness is checked, never assumed (unlike
  * the rolling-hash kernel, where collisions are silently semantic).
  *
  * Scale shape: ⌈log₂ L⌉ doubling rounds, each = one self-equi-join on
  * (doc_id, pos+k) + one verification aggregation; all shuffles carry
  * (doc_id, pos, class) triples, never text after round 1. At 100 TB
  * that is log L passes over fixed-width rows vs the rolling-hash
  * kernel's single pass — the price of exactness, bounded and known.
  * Work is positions × rounds; no stage is corpus-quadratic.
  */
object ExactSpans {

  /** Anchor-count cap for the doubling path: doubling stops at the
    * smallest k with ⌈L/k⌉ ≤ this many covering anchors; the anchors
    * then combine in one multi-way co-partitioned join. */
  private val AnchorCap = 4

  /** Direct-materialization bound: windows of up to this many tokens
    * build their verbatim window string IN-ROW and use it as the class
    * — one explode, zero joins, zero verification (string equality IS
    * the exactness; this is also the oracle's own shape). Above it the
    * doubling machinery runs: window strings would cost
    * O(positions × L) bytes while doubling moves O(positions × log L)
    * fixed-width rows — the crossover is why both paths exist. */
  private val DirectMaxL = 32

  /** (doc_id, pos, cls): the exact equivalence class of the L-token
    * window starting at `pos` (0-based), for every position with a
    * full window (pos + L ≤ doc length). Two rows share `cls` iff
    * their windows are VERBATIM equal. `cls` is a STRING on the direct
    * path (L ≤ [[DirectMaxL]]: the window text itself) and a LONG on
    * the doubling path — callers group/join on it either way.
    *
    * Doubling-path round structure: vocabulary classes, then doubling
    * k = 1→2→4→… until ⌈L/k⌉ ≤ [[AnchorCap]] anchors remain, then one
    * multi-way co-partitioned join combines the anchor classes —
    * window_L(i) = window_L(j) iff all k-anchors at offsets
    * {0, k, 2k, …} ∪ {L−k} agree (they tile [0, L) with overlap, the
    * standard suffix-ranking anchor argument). Example L=50:
    * k=16 after three doublings, four anchors (0, 16, 32, 34). Every
    * join is co-partitioned on doc_id (the stream repartitions once),
    * so rounds add no exchanges — just per-doc sort-merge work. */
  def windowClasses(docs: DataFrame, textCol: String, L: Int): DataFrame = {
    require(L >= 1 && L <= 4096, s"L=$L out of [1, 4096]")
    val spark = docs.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val toksCol = filter(split(lower(col(textCol)), "[^a-z]+"), x => x =!= "")
    if (L <= DirectMaxL) {
      // r15: the window strings come from the TokenWindowStrings codegen
      // kernel (one byte-extract per token per doc, one write per
      // window). The HOF chain it replaces — transform(sequence(...),
      // i -> array_join(slice(__t, i+1, L), chr(31))) guarded by
      // when(size >= L) — is interpreted per window (HOFs don't
      // whole-stage-codegen) and re-extracts each token ~L times;
      // measured 41% of q153 at the 10× corpus. TokenWindowsSpec pins
      // bit-equality incl. the short-doc empty-array guard, which the
      // kernel builds in.
      return docs
        .select(col("doc_id"), posexplode(
          graft.functions.TokenWindowStrings.tokenWindowStrings(toksCol, L))
          .as(Seq("pos", "cls")))
    }
    // token stream with positions; the only stage that touches strings.
    // Partitioned by doc_id ONCE — a subset of every later join's keys,
    // so all self-joins below satisfy their distribution exchange-free.
    val stream = docs
      .select(col("doc_id"), posexplode(toksCol).as(Seq("pos", "tok")))
      .repartition(p, col("doc_id"))
    // (no checkpoint here: assignClasses materializes its input — a
    // second one would just write the string stream twice)
    // smallest power-of-two k whose anchor count ⌈L/k⌉ fits the cap
    // (k < L always on this path: L > DirectMaxL ≥ AnchorCap, so the
    // while loop stops at the first k with ⌈L/k⌉ ≤ AnchorCap, which
    // has k ≤ L/2)
    var k = 1
    while (math.ceil(L.toDouble / k) > AnchorCap) k *= 2
    // vocabulary classes FIRST, always: strings are touched exactly
    // once (the class assignment), and everything downstream — the
    // multi-way anchor join and any doubling rounds — moves 8-byte
    // longs (measured r11: letting token STRINGS ride a 12-way join
    // was 1.5× slower at sf0.1 and ~5× at the 10× corpus)
    var ranks = assignClasses(stream, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("cls"))
    var kk = 1
    while (kk * 2 <= k) {
      ranks = doubled(ranks, kk)
      kk *= 2
    }
    // anchor offsets tile [0, L): 0, k, 2k, … plus the final L−k
    // (k < L here — see the loop comment — so offsets is non-trivial)
    val offsets = ((0 until (L / k)).map(_ * k) :+ (L - k))
      .distinct.sorted
    val base = ranks.select(col("doc_id"), col("pos"),
      col("cls").as("a0"))
    val joined = offsets.zipWithIndex.drop(1).foldLeft(base) {
      case (acc, (off, i)) =>
        acc.join(ranks.select(col("doc_id"),
            (col("pos") - off).as("pos"), col("cls").as(s"a$i")),
          Seq("doc_id", "pos"))
    }
    assignClasses(joined, offsets.indices.map(i => s"a$i"))
      .select(col("doc_id"), col("pos"), col("cls"))
  }

  /** Positions whose exact L-token window occurs >= 2 times corpus-wide
    * (the ExactSubstr membership test): (doc_id, pos, n_occ). */
  def duplicatedPositions(docs: DataFrame, textCol: String,
      L: Int): DataFrame = {
    val cls = windowClasses(docs, textCol, L).localCheckpoint(true)
    val dup = cls.groupBy(col("cls"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
    cls.join(dup, Seq("cls"))
      .select(col("doc_id"), col("pos"), col("n_occ"))
  }

  /** One doubling round: (doc_id, pos, cls_k) -> (doc_id, pos, cls_2k). */
  private def doubled(ranks: DataFrame, k: Int): DataFrame = {
    val left = ranks.select(col("doc_id"), col("pos"), col("cls").as("c1"))
    val right = ranks.select(col("doc_id"), (col("pos") - k).as("pos"),
      col("cls").as("c2"))
    val pairs = left.join(right, Seq("doc_id", "pos"))
    assignClasses(pairs, Seq("c1", "c2"))
      .select(col("doc_id"), col("pos"), col("cls"))
  }

  /** `cls` = an EXACT equivalence-class id of `keyCols`: the in-row
    * xxhash64 candidate, kept only after one aggregation PROVES it
    * injective on this dataset; otherwise the deterministic dense-id
    * fallback runs (object scaladoc). The input is checkpointed first
    * so the verification pass and the (usual) hash path never
    * recompute the upstream join. */
  private def assignClasses(df0: DataFrame, keyCols: Seq[String]): DataFrame = {
    val df = df0.localCheckpoint(true)
    val hashed = df.withColumn("cls", xxhash64(keyCols.map(col): _*))
    // injectivity proof in ONE distinct pass: distinct over (keys, cls)
    // IS distinct over keys (cls is a function of them); the hash is
    // injective iff the small distinct set has as many cls values as
    // rows. (A two-countDistinct agg would EXPAND the full stream 2×;
    // this shuffles it once and aggregates the reduced set.)
    val r = hashed.select((keyCols.map(col) :+ col("cls")): _*).distinct()
      .agg(count(lit(1)).as("np"), countDistinct(col("cls")).as("nh"))
      .head()
    if (r.getLong(0) == r.getLong(1)) hashed
    else {
      // 64-bit collision on this dataset: exact fallback
      val ids = denseIds(df.select(keyCols.map(col): _*).distinct()
        .orderBy(keyCols.map(col): _*), "cls")
      df.join(ids, keyCols)
    }
  }

  /** Deterministic dense ids for the (already distinct, already sorted)
    * rows of `df`: range-partitioned sort order + zipWithIndex — the
    * distributed exact dense_rank (a global row_number window would
    * serialize into one task; zipWithIndex preserves the sorted
    * partition order, so ids are a pure function of the row set). */
  private def denseIds(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}
