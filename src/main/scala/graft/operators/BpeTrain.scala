package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909) — the vocabulary-induction step of a training-data
  * pipeline, distributed the way the algorithm actually scales:
  *
  *  1. ONE corpus pass collapses the text to a WORD-FREQUENCY table
  *     (vocabulary-sized — this is the whole trick; every later round
  *     works on |V| rows, never the corpus).
  *  2. Each merge round counts adjacent symbol pairs weighted by word
  *     frequency (a vocabulary-sized explode + groupBy), picks the most
  *     frequent pair (ties: lexicographically smallest — deterministic
  *     across engines and runs), and applies it to every word with the
  *     standard greedy left-to-right scan.
  *
  * The per-round winning pair is a 1-row aggregate collected to the
  * driver — that is inherent to BPE (each round's rule depends on the
  * last) and costs one tiny job per merge; the corpus is touched once.
  * Rounds `localCheckpoint` so `numMerges` rounds never stack lineage.
  */
object BpeTrain {

  /** The canonical corpus tokenizer (TextDedup.toks — the q29/q84
    * family): lowercase, split on non-alpha runs. */
  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextDedup.toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Adjacent-pair frequencies over a (w, cnt) word table with words
    * split to their current symbol arrays — round 1 of the trainer,
    * exposed for the oracle-checked pair-statistics query. */
  def pairStats(docs: DataFrame, textCol: String): DataFrame = {
    val syms = words(docs, textCol)
      .select(split(col("w"), "").as("s"), col("cnt"))
    pairCounts(syms)
  }

  private def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("s")) >= 2)
      .select(explode(arrays_zip(
        slice(col("s"), lit(1), size(col("s")) - 1).as("l"),
        slice(col("s"), lit(2), size(col("s")) - 1).as("r"))).as("p"), col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).cast("long").as("freq"))

  /** Greedy left-to-right application of one merge to a symbol array —
    * the textbook scan: after a merge the cursor moves past the new
    * symbol ("aaa" + (a,a) → [aa, a], never [a, aa]). */
  private[graft] def mergeOnce(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Vocabulary-row gate below which the merge loop finishes on the
    * driver (conf `spark.graft.bpe.localVocabMax`). The collapsed
    * (word, freq) table is vocabulary-sized — at the default cap it is
    * ≤262k short ASCII strings, a few MB — while every DISTRIBUTED
    * round costs two scheduled jobs on that same tiny table. This is
    * the repo's established cost-gate pattern (SketchFilter
    * .bloomSemiAuto, Profiling.profile): answer-identical branches,
    * the cheap one chosen from a measured size, the distributed one
    * kept for vocabularies that genuinely exceed driver comfort. A
    * 100 TB corpus takes the same branch — its collapse output is
    * still vocabulary-sized, ≪ corpus. */
  val DefaultLocalVocabMax: Long = 1L << 18

  /** Learn `numMerges` merges from the corpus; returns them in learned
    * order as (rank, left, right, freq). Stops early if no pair repeats. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] =
    trainTrace(docs, textCol, numMerges).map(_._1)

  /** [[train]] plus the post-round corpus tokenization size — the total
    * symbol count Σ cnt·|syms(w)| after each merge is applied. It makes
    * the whole LOOP oracle-checkable (q89): the winning pair proves the
    * count/argmax/tie-break chain, the shrinking total proves the
    * greedy apply actually rewrote the words it claims.
    *
    * Job accounting (BPE's cost is round-scheduling, not data): TWO
    * tiny jobs per round — the merge-apply checkpoint and ONE fused
    * aggregate over the pair table that yields both the next argmax
    * (`min_by` over the lexicographic (-freq, l, r) key ≡ the
    * deterministic (freq DESC, l, r) tie-break) and the total pair
    * mass, from which the symbol total falls out for free: every word
    * has |s| ≥ 1, so Σ cnt·|s| = Σ freq + Σ cnt, and Σ cnt (word
    * occurrences) never changes across rounds.
    *
    * COST GATE (r8 verdict item 1): when the collapsed vocabulary is
    * ≤ `spark.graft.bpe.localVocabMax` rows (default
    * [[DefaultLocalVocabMax]]) the loop finishes on the driver via
    * [[trainTraceLocal]] — answer-identical by construction and
    * spec-pinned (BpeTrainSpec runs both branches on the same corpus
    * and asserts equality). That converts 2·numMerges scheduled jobs
    * over a tiny table into one collect; the distributed branch still
    * engages for genuinely large vocabularies (set the conf to 0 to
    * force it). */
  def trainTrace(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(Merge, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var syms: Dataset[(Seq[String], Long)] = words(docs, textCol)
      .select(split(col("w"), "").as("s"), col("cnt"))
      .as[(Seq[String], Long)]
      .localCheckpoint(eager = true)
    // sum over zero rows is SQL NULL — an empty/token-free corpus must
    // return Seq.empty like it always did, not NPE on getLong. The row
    // count rides the same 1-row aggregate for free: it feeds the
    // local-vs-distributed gate below.
    val totalCntRow = syms.toDF("s", "cnt")
      .agg(sum(col("cnt")), count(lit(1))).head()
    if (totalCntRow.isNullAt(0)) return Seq.empty
    val totalCnt = totalCntRow.getLong(0)
    val vocabRows = totalCntRow.getLong(1)
    val localMax = spark.conf.getOption("spark.graft.bpe.localVocabMax")
      .map(_.toLong).getOrElse(DefaultLocalVocabMax)
    if (vocabRows <= localMax) {
      val out = trainTraceLocal(syms.collect().toSeq, totalCnt, numMerges)
      syms.unpersist()
      return out
    }
    // (winning l, winning r, its freq, Σ freq) — None when no pair repeats
    def stats(ds: Dataset[(Seq[String], Long)]): Option[(String, String, Long, Long)] = {
      val row = pairCounts(ds.toDF("s", "cnt")).agg(
        min_by(struct(col("l"), col("r"), col("freq")),
          struct((-col("freq")).as("nf"), col("l"), col("r"))).as("top"),
        sum(col("freq")).as("tot")).head()
      if (row.isNullAt(0)) None
      else {
        val t = row.getStruct(0)
        Some((t.getString(0), t.getString(1), t.getLong(2), row.getLong(1)))
      }
    }
    val learned = Seq.newBuilder[(Merge, Long)]
    var cur = stats(syms)
    var round = 1
    // Checkpoint CADENCE, not every round: the per-round maps are
    // narrow transforms of a |V|-row table, so letting a few of them
    // chain costs trivial recompute inside the next stats job, while
    // each eager localCheckpoint costs a whole extra Spark job — at 8
    // merges that was half the loop's wall-clock. Every CkptEvery
    // rounds the lineage is cut (and the dead checkpoint dropped), so
    // a 32k-merge run still never stacks more than CkptEvery maps.
    val CkptEvery = 4
    var lastCkpt = syms
    while (round <= numMerges && cur.nonEmpty) {
      val (l, r, f, _) = cur.get
      syms = syms.map { case (s, cnt) => (mergeOnce(s, l, r), cnt) }
      if (round % CkptEvery == 0) {
        syms = syms.localCheckpoint(eager = true)
        // a 32k-merge run must not pin every cut's |V|-row checkpoint
        // until the ContextCleaner notices — drop the dead one now
        lastCkpt.unpersist()
        lastCkpt = syms
      }
      // next round's stats double as THIS round's post-merge totals; a
      // fully-merged corpus (no pairs left) is one symbol per word
      // occurrence, Σ freq = 0
      cur = stats(syms)
      learned += ((Merge(round, l, r, f), cur.map(_._4).getOrElse(0L) + totalCnt))
      round += 1
    }
    learned.result()
  }

  /** The gate-below branch of [[trainTrace]]: the identical algorithm
    * on the collected (syms, cnt) table — same pair count, same
    * (freq DESC, l, r) argmax, same [[mergeOnce]] greedy apply, same
    * post-round total (Σ freq + Σ cnt), same stop condition (no
    * adjacent pairs left at all, matching the distributed branch's
    * null-aggregate test). Symbols are [a-z]+ concatenations (the
    * canonical tokenizer strips everything else), so JVM String
    * ordering and Spark's UTF8 binary ordering agree on the
    * tie-break — both are ASCII byte order here. */
  private[graft] def trainTraceLocal(words0: Seq[(Seq[String], Long)],
      totalCnt: Long, numMerges: Int): Seq[(Merge, Long)] = {
    import scala.collection.mutable
    var ws: Array[(Seq[String], Long)] = words0.toArray
    def pairTable(): mutable.HashMap[(String, String), Long] = {
      val m = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < ws.length) {
        val (s, cnt) = ws(i)
        var j = 0
        while (j + 1 < s.length) {
          val k = (s(j), s(j + 1))
          m.update(k, m.getOrElse(k, 0L) + cnt)
          j += 1
        }
        i += 1
      }
      m
    }
    val learned = Seq.newBuilder[(Merge, Long)]
    var pairs = pairTable()
    var round = 1
    while (round <= numMerges && pairs.nonEmpty) {
      val ((l, r), f) = pairs.minBy { case ((pl, pr), pf) => (-pf, pl, pr) }
      ws = ws.map { case (s, cnt) => (mergeOnce(s, l, r), cnt) }
      pairs = pairTable()
      learned += ((Merge(round, l, r, f), pairs.valuesIterator.sum + totalCnt))
      round += 1
    }
    learned.result()
  }

  /** Encode one word with a learned merge list (ranks applied in
    * order) — the driver-side utility for inspecting the vocabulary. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(word.split("").toSeq) { (s, m) =>
      mergeOnce(s, m.left, m.right)
    }

  /** Tokenize a corpus column to learned-BPE symbol counts per doc —
    * merges broadcast as plain data, the encode is one narrow map. */
  def encodeTokens(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        // Locale.ROOT: the default-locale toLowerCase diverges from
        // Spark's lower() on tr/az JVMs (dotless ı leaves [a-z])
        val toks = text.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z]+").filter(_.nonEmpty)
        val n = toks.iterator.map { w =>
          ms.foldLeft(w.split("").toSeq) { (s, m) => mergeOnce(s, m._1, m._2) }.length
        }.sum
        (id, n.toLong)
      }
      .toDF(idCol, "n_bpe_symbols")
  }
}
