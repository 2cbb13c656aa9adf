package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ExpectsInputTypes, Expression, Literal, ScalarSubquery, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-prefiltered joins — the 100 TB shape of "does this key exist
  * on the other side": build a mergeable Bloom sketch over the build
  * side's keys (one aggregation, map-side combined), ship the sketch to
  * every probe task, and drop probe rows that CANNOT match before any
  * probe-side shuffle. The exact join still runs after the prefilter,
  * so false positives are eliminated and the result is IDENTICAL to the
  * plain join — only the shuffled probe volume changes (by the
  * miss rate; a decontamination scan where ~1% of eval spans hit train
  * ships ~1% of the rows it used to).
  *
  * Built on Spark's own sketch machinery: `BloomFilterAggregate` (the
  * aggregate behind AQE's runtime row-level filtering) and the codegen
  * `BloomFilterMightContain` predicate — not a UDF, so the probe-side
  * check fuses into whole-stage codegen. The sketch travels as a
  * literal in the plan (same physics as a broadcast dim, sized by
  * `fpp`, e.g. ~1.2 MB for 1M keys at 1% fpp).
  */
object SketchFilter {

  /** Left-semi join with a Bloom prefilter on the probe (left) side.
    * Result is bit-identical to `left SEMI JOIN right` on the keys —
    * the sketch admits no false negatives and the exact join removes
    * its false positives (an EMPTY build side yields a null sketch,
    * whose probe is null, filtering everything — the correct empty semi
    * join). Keys must be BIGINT (the aggregate's input contract; hash
    * wider keys first).
    *
    * LAZY: the sketch rides as a ScalarSubquery over the build
    * aggregate — the exact shape Spark's own InjectRuntimeFilter emits
    * — so nothing executes at construction time (plan-only inspection
    * is free, r4 advisory) and the build side is read when the query
    * runs, not when it is assembled. At execution the subquery result
    * still materializes on the driver and ships with the task binaries,
    * so size the sketch like a broadcast dim (fpp/expectedItems — an
    * undersized sketch only loses selectivity, never correctness).
    *
    * REFUSES sketches above `maxSketchBytes` (default 128 MB) at
    * construction time — the nearDupPairs loudness contract: a plan
    * LITERAL of that size re-serializes with the physical plan on
    * every stage submission and bloats every plan string, which is the
    * wrong physics at 10^10 keys. Use [[bloomSemiBroadcast]] there: the
    * sketch travels once per executor as a torrent-chunked broadcast. */
  def bloomSemi(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01,
      maxSketchBytes: Long = 128L << 20): DataFrame = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    require(numBits / 8 <= maxSketchBytes,
      s"bloomSemi ships the sketch as a PLAN LITERAL and refuses sketches > " +
        s"$maxSketchBytes bytes (expectedItems=$expectedItems at fpp=$fpp needs " +
        s"${numBits / 8} bytes). At this scale a literal re-ships with every " +
        s"stage; use bloomSemiBroadcast (torrent-chunked, fetched once per " +
        s"executor), raise maxSketchBytes explicitly, or raise fpp.")
    val agg = new BloomFilterAggregate(
      Bridge.expression(col(rightKey)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val sketchPlan = Bridge.logicalPlan(
      right.select(Bridge.column(agg).as("__sketch")))
    val pre = left.filter(Bridge.column(BloomFilterMightContain(
      ScalarSubquery(sketchPlan), Bridge.expression(col(leftKey)))))
    pre.join(right, col(leftKey) === col(rightKey), "leftsemi")
  }

  /** Cost-gated [[bloomSemi]] — a three-way gate by probe size and
    * sketch size:
    *  - probe estimate under `minProbeBytes` (Catalyst's estimate for
    *    the optimized probe plan; localCheckpointed inputs keep their
    *    origin estimate): the PLAIN semi join — the sketch-build pass
    *    only pays for itself when shrinking the probe shuffle matters.
    *    An UNKNOWN estimate (Catalyst's Long.MaxValue default) counts
    *    as big — at real scale the conservative choice is the sketch.
    *  - sketch fits in `maxSketchBytes`: the LAZY plan-literal form
    *    ([[bloomSemi]] — nothing executes at construction).
    *  - sketch above `maxSketchBytes` (the 10^10-key regime):
    *    [[bloomSemiBroadcast]] — EAGER build-side scan now, sketch
    *    shipped as a torrent-chunked broadcast instead of a plan
    *    literal; at that scale the build pass is inevitable and the
    *    literal form would refuse anyway. This branch changes two
    *    behaviors the caller may not anticipate from a growing
    *    `expectedItems` (r7 advisory): construction runs a full
    *    build-side Spark job (plan-only inspection is no longer free),
    *    and keys must be integral (it throws on string keys, where the
    *    literal form would have analyzed). It therefore requires the
    *    explicit `autoBroadcast = true` opt-in; without it the gate
    *    FAILS FAST here with a pointer instead of silently running the
    *    eager job. Callers that need lazy assembly or non-integral keys
    *    at this size should pre-hash to BIGINT and call a form
    *    explicitly. */
  def bloomSemiAuto(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01,
      minProbeBytes: Long = 256L << 20,
      maxSketchBytes: Long = 128L << 20,
      autoBroadcast: Boolean = false): DataFrame = {
    val est = left.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(minProbeBytes))
      left.join(right, col(leftKey) === col(rightKey), "leftsemi")
    else if (BloomFilter.optimalNumOfBits(expectedItems, fpp) / 8 > maxSketchBytes) {
      require(autoBroadcast,
        s"bloomSemiAuto: the sketch for expectedItems=$expectedItems at fpp=$fpp " +
          s"(${BloomFilter.optimalNumOfBits(expectedItems, fpp) / 8} bytes) exceeds " +
          s"maxSketchBytes=$maxSketchBytes, and the broadcast fallback runs an " +
          "EAGER build-side job and requires integral keys. Opt in with " +
          "autoBroadcast = true, call bloomSemiBroadcast directly, raise " +
          "maxSketchBytes explicitly, or raise fpp.")
      bloomSemiBroadcast(left, leftKey, right, rightKey, expectedItems, fpp)
    } else bloomSemi(left, leftKey, right, rightKey, expectedItems, fpp, maxSketchBytes)
  }

  /** [[bloomSemi]] for sketches too big to ride as a plan literal (the
    * 10^10-key regime): the Bloom filter is built EXECUTOR-SIDE
    * (per-partition sketches, merged tree-wise — `stat.bloomFilter`'s
    * treeAggregate, so no single task sees all keys), then shipped as a
    * torrent-chunked BROADCAST: stored once in each executor's block
    * manager and referenced from the plan by id only, instead of
    * re-serializing GBs with every stage submission. The probe predicate
    * is a native codegen Expression over the broadcast, so it fuses into
    * whole-stage codegen exactly like `might_contain`.
    *
    * Trade-offs vs [[bloomSemi]], both inherent to broadcasting:
    * construction is EAGER (the build-side scan runs now, like
    * `broadcast(dim)` materialization), and the driver holds the sketch
    * once while chunking it — size executor AND driver memory for
    * `numBits/8` bytes. Result is bit-identical to the plain left-semi
    * join (no false negatives; the exact join clears false positives).
    *
    * Lifetime: the broadcast lives while the returned DataFrame is
    * reachable (the expression holds the handle); once the plan is
    * GC'd, Spark's ContextCleaner unpersists the blocks — the same
    * physics as a cached broadcast-join plan. For multi-GB sketches in
    * long-lived sessions don't wait for GC: use
    * [[bloomSemiBroadcastWithHandle]] and `destroy()` the handle after
    * the query's last execution. */
  def bloomSemiBroadcast(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    bloomSemiBroadcastWithHandle(left, leftKey, right, rightKey, expectedItems, fpp)._1

  /** Streaming DECONTAMINATION on ingest — the append-mode-safe form of
    * the q70/q76 batch scan: flag incoming documents that share any
    * w-token span with a STATIC eval set, entirely in-row (no state, no
    * stream-side aggregation, no join), so it composes with any
    * downstream sink in append mode.
    *
    * The eval set's distinct span hashes build ONE Bloom sketch at
    * assembly time (a batch job over the static side — size with
    * expectedSpans/fpp like a broadcast dim), broadcast once; every
    * incoming doc then probes its own spans in-row via `exists(...)`
    * (the span kernel is codegen; the exists lambda itself evaluates
    * interpreted — fine at micro-batch sizes, q90's stream-side
    * trade). Output = input columns + `contaminated`.
    *
    * Semantics: no false NEGATIVES (a truly contaminated doc always
    * flags — the sketch admits none), false positives over-flag clean
    * docs at ≤ fpp per distinct span — the SAFE direction for
    * decontamination, and exactly what a 100 TB ingest filter does
    * (the exact semi-join re-check is the batch q70; run it over the
    * flagged slice offline if over-drop matters). Returns the flagged
    * stream and the broadcast handle (`destroy()` after the query
    * stops; the q76 lifetime contract). */
  def decontaminateStream(stream: DataFrame, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, w: Int,
      expectedSpans: Long, fpp: Double = 0.001): (DataFrame, Broadcast[BloomFilter]) = {
    val evalSpans = evalDocs.select(explode(
        graft.functions.TokenSpanHashes.tokenSpanHashes(
          TextDedup.toks(col(evalTextCol)), w)).as("h"))
    val sketch = evalSpans.stat.bloomFilter("h", expectedSpans, fpp)
    val bc = stream.sparkSession.sparkContext.broadcast(sketch)
    val flagged = stream.withColumn("contaminated",
      exists(
        graft.functions.TokenSpanHashes.tokenSpanHashes(
          TextDedup.toks(col(textCol)), w),
        h => Bridge.column(BloomMightContainBroadcast(bc, Bridge.expression(h)))))
    (flagged, bc)
  }

  /** [[bloomSemiBroadcast]] + the broadcast handle, so callers can
    * `handle.destroy()` a multi-GB sketch deterministically instead of
    * waiting for the plan to be GC'd (executing the DataFrame after
    * destroying the handle fails — destroy only after the last run). */
  def bloomSemiBroadcastWithHandle(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): (DataFrame, Broadcast[BloomFilter]) = {
    // Same BIGINT key contract as bloomSemi — but here it must be
    // ENFORCED: the build side sketches via putLong and the probe via
    // mightContainLong, so a silently-widened string/decimal key would
    // produce FALSE NEGATIVES (dropped matches), not an analysis error.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    for ((df, k, side) <- Seq((left, leftKey, "probe"), (right, rightKey, "build")))
      require(integral.contains(df.schema(k).dataType),
        s"bloomSemiBroadcast $side key '$k' must be an integral type " +
          s"(got ${df.schema(k).dataType.simpleString}); hash wider keys " +
          "to BIGINT first (e.g. xxhash64) — a lossy cast here would drop matches")
    val sketch = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(sketch)
    val pre = left.filter(Bridge.column(BloomMightContainBroadcast(
      bc, Bridge.expression(col(leftKey).cast("long")))))
    (pre.join(right, col(leftKey) === col(rightKey), "leftsemi"), bc)
  }
}

/** `mightContainLong` over a BROADCAST Bloom sketch as a native codegen
  * predicate — the executor-scale twin of Spark's `BloomFilterMightContain`
  * (whose sketch child must be a foldable literal/subquery). The expression
  * serializes as just the broadcast handle; executors fetch the sketch
  * chunks once and every row probes the block-manager-resident bitset
  * inside whole-stage codegen. */
case class BloomMightContainBroadcast(
    bf: Broadcast[BloomFilter],
    child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_bc"

  override def nullSafeEval(input: Any): Any =
    bf.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bf)
    // Broadcast.value() resolves to a cached local read after the first
    // chunk fetch, so the per-row cost is one virtual call + the probe.
    defineCodeGen(ctx, ev, c => s"(($bfClass) $bcRef.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}
