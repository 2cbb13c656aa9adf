package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** Support-floor PREFILTER for heavy aggregations whose key stream is
  * nearly all-unique (r12, verdict item 1 — the q121 basket-lift
  * shape): when `groupBy(key).count().filter(count >= floor)` keeps
  * only a sliver of ~all-distinct keys, map-side combine buys nothing
  * and the FULL key stream crosses the exchange just to be counted
  * once and dropped. This operator makes one cheap narrow pass over
  * the same stream building a tiny saturating count sketch
  * ([[SatCountSketch]]), broadcasts it, and drops rows whose key
  * CANNOT reach the floor BEFORE the exchange.
  *
  * Exactness: the sketch only ever OVER-estimates (hash collisions add,
  * saturation caps at `cap ≥ floor`), so `est(k) < floor ⇒ true
  * count(k) < floor` — every surviving key's aggregate row is computed
  * from its full, unfiltered row set (all occurrences of a key get the
  * same verdict), and every dropped key would have failed the floor
  * filter anyway. Result is bit-identical to the unfiltered plan
  * (CoOccurSpec pins it). False KEEPS (collisions) cost only wasted
  * shuffle rows, never wrong answers; at the default load factor 0.5
  * a count-1 key needs ≥2 colliders in its cell to survive a floor of
  * 3 — P ≈ 0.09 — so ~90% of the unique-key stream dies map-side.
  *
  * Cost shape: ONE extra narrow pass over the key stream (a splitmix64
  * mix + one array bump per row, treeAggregate-merged) + a
  * `cells/2`-byte broadcast. It pays when the aggregation's exchange +
  * reduce-side hash table dominate — i.e. at volume, on a network-bound
  * cluster, or both; below that the plain aggregation wins, which is
  * why call sites GATE on the estimated key count (q121 gates on the
  * exact C(k,2) pair total at `spark.graft.basket.prekillMinPairs`).
  */
object CountFloor {

  /** Build the sketch over `keyCol` (BIGINT) with one executor-side
    * pass: per-partition sketches, tree-merged — no single task sees
    * the whole stream, the zero value ships as an unallocated shell.
    * `expectedKeys / loadFactor` sizes the cell array (rounded up to a
    * power of two); REFUSES sketches above `maxBytes` loudly (the
    * bloomSemiBroadcast contract — an oversized sketch is the wrong
    * physics, not a warning). */
  def sketch(df: DataFrame, keyCol: String, expectedKeys: Long,
      loadFactor: Double = 0.5, cap: Int = 7,
      maxBytes: Long = 256L << 20): Broadcast[SatCountSketch] = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    require(loadFactor > 0 && loadFactor <= 1.0,
      s"loadFactor in (0, 1], got $loadFactor")
    val wantCells = math.max(16L, math.ceil(expectedKeys / loadFactor).toLong)
    val cells = java.lang.Long.highestOneBit(wantCells - 1) << 1
    require(cells / 2 <= maxBytes,
      s"CountFloor.sketch: $cells cells (${cells / 2} bytes) exceed " +
        s"maxBytes=$maxBytes for expectedKeys=$expectedKeys at " +
        s"loadFactor=$loadFactor — raise maxBytes deliberately or accept " +
        "a higher loadFactor (an overloaded sketch only keeps more " +
        "false-positive rows, never breaks correctness)")
    val plan = df.select(col(keyCol).cast("long")).queryExecution.toRdd
    val merged = plan.treeAggregate(new SatCountSketch(cells.toInt, cap))(
      seqOp = (s, r) => { if (!r.isNullAt(0)) s.add(r.getLong(0)); s },
      combOp = (a, b) => { a.merge(b); a },
      depth = 2)
    df.sparkSession.sparkContext.broadcast(merged)
  }

  /** Largest `expectedKeys` whose sketch fits `maxBytes` at
    * `loadFactor` — the call-site CAP for unbounded key streams (r13
    * ADVICE): pass `min(actualKeys, maxKeysFor(...))` so a corpus whose
    * key count outgrows the byte budget degrades to a higher effective
    * load factor (more false keeps, never wrong answers) instead of
    * hard-failing the [[sketch]] size require at exactly the volumes
    * the pre-kill exists for. */
  def maxKeysFor(loadFactor: Double = 0.5, maxBytes: Long = 256L << 20): Long = {
    val cellsCap = java.lang.Long.highestOneBit(math.max(16L, maxBytes * 2))
    math.max(1L, (cellsCap * loadFactor).toLong)
  }

  /** Codegen predicate: true iff the sketch cannot rule out
    * `count(key) >= floor`. `floor` must be ≤ the sketch's cap. */
  def atLeast(bc: Broadcast[SatCountSketch], key: Column, floor: Int): Column = {
    require(floor <= bc.value.cap,
      s"CountFloor.atLeast: floor=$floor exceeds the sketch cap " +
        s"${bc.value.cap} — saturated cells can never reach it and every " +
        "row would be dropped; build the sketch with cap >= floor")
    Bridge.column(SatCountAtLeast(bc, floor, Bridge.expression(key)))
  }

  /** [[sketch]] specialized to the PACKED-PAIR stream of
    * [[CoOccur.packedPairsFromBaskets]], built straight from the basket
    * arrays: a tight in-JVM double loop packs `ps[i]·2³² + ps[j]` and
    * bumps the cell — no second Catalyst explode. Measured at the 10×
    * corpus the generic [[sketch]] paid ~1.4 s re-running the HOF
    * explode for its build pass (more than the shuffle it saved); this
    * form reads the checkpointed basket blocks once at array speed.
    * MUST mirror packedPairsFromBaskets' packing exactly — an id
    * outside [0, 2³¹) would desync build and probe keys, so the same
    * range contract is enforced here (loudly, per basket). */
  def sketchPackedPairs(baskets: DataFrame, psCol: String,
      expectedKeys: Long, loadFactor: Double = 0.5, cap: Int = 7,
      maxBytes: Long = 256L << 20): Broadcast[SatCountSketch] = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    val wantCells = math.max(16L, math.ceil(expectedKeys / loadFactor).toLong)
    val cells = java.lang.Long.highestOneBit(wantCells - 1) << 1
    require(cells / 2 <= maxBytes,
      s"CountFloor.sketchPackedPairs: $cells cells (${cells / 2} bytes) " +
        s"exceed maxBytes=$maxBytes — raise maxBytes deliberately or accept " +
        "a higher loadFactor")
    val plan = baskets.select(col(psCol)).queryExecution.toRdd
    val merged = plan.treeAggregate(new SatCountSketch(cells.toInt, cap))(
      seqOp = (s, r) => {
        if (!r.isNullAt(0)) {
          val a = r.getArray(0)
          val n = a.numElements()
          // range check once per basket on the sorted array's ends —
          // the packedPairsFromBaskets contract; n >= 2 matches
          // PackedPairs.pack exactly (singletons produce no pairs there
          // and must not throw here either)
          if (n >= 2 && (a.getLong(0) < 0L || a.getLong(n - 1) >= 2147483648L))
            throw new IllegalArgumentException(
              s"sketchPackedPairs: item id range [${a.getLong(0)}, " +
                s"${a.getLong(n - 1)}] outside [0, 2^31) — " +
                "use pairsFromBaskets (struct keys)")
          var i = 0
          while (i < n) {
            val x = a.getLong(i) * 4294967296L
            var j = i + 1
            while (j < n) { s.add(x + a.getLong(j)); j += 1 }
            i += 1
          }
        }
        s
      },
      combOp = (a, b) => { a.merge(b); a },
      depth = 2)
    baskets.sparkSession.sparkContext.broadcast(merged)
  }
}

/** Saturating count sketch over 4-bit lanes (16 cells per long): cell
  * values count key arrivals up to `cap ∈ [1, 7]`, merges are SWAR
  * lane-wise saturating adds (lane sums ≤ 2·cap ≤ 14 never carry into
  * the neighbor lane; a post-add clamp pins each lane back to cap).
  * One hash row: with floor-style probes the question is "could this
  * cell have reached `floor`", and a single row at load λ already
  * answers it wrongly only when ≥ floor−count(key) OTHER keys collide
  * into the same cell — for floor 3 on a unique-key stream that is
  * P[Poisson(λ) ≥ 2] ≈ 9% at λ=0.5 — while halving memory and
  * per-row cost vs a 2-row CMS.
  *
  * The cell array allocates LAZILY: the treeAggregate zero value ships
  * as an empty shell (a serialized null, not `cells/2` zero bytes) and
  * each task materializes its own array on first touch. */
final class SatCountSketch(val cells: Int, val cap: Int) extends Serializable {
  require(cells >= 16 && Integer.bitCount(cells) == 1,
    s"cells must be a power of two >= 16, got $cells")
  require(cap >= 1 && cap <= 7, s"cap in [1, 7], got $cap (4-bit lanes " +
    "need merge headroom: lane sums must stay < 16)")

  private var data: Array[Long] = _

  private def ensure(): Array[Long] = {
    if (data == null) data = new Array[Long](cells >>> 4)
    data
  }

  @inline private def mix(k: Long): Long = {
    var z = k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def add(key: Long): Unit = {
    val d = ensure()
    val idx = (mix(key) & (cells - 1)).toInt
    val li = idx >>> 4
    val sh = (idx & 15) << 2
    if (((d(li) >>> sh) & 0xFL) < cap) d(li) += (1L << sh)
  }

  /** True iff the (over-estimating) cell count is ≥ floor. A floor
    * above `cap` is unreachable by saturated cells — refuse it loudly
    * rather than silently dropping every key. */
  def atLeast(key: Long, floor: Int): Boolean = {
    if (floor > cap)
      throw new IllegalArgumentException(
        s"SatCountSketch.atLeast: floor=$floor > cap=$cap — every cell " +
          "saturates below the floor; rebuild with cap >= floor")
    if (data == null) return floor <= 0
    val idx = (mix(key) & (cells - 1)).toInt
    ((data(idx >>> 4) >>> ((idx & 15) << 2)) & 0xFL) >= floor
  }

  /** Lane-wise saturating add of `other` into this (SWAR, see class
    * doc). Accepts only a same-shape sketch. */
  def merge(other: SatCountSketch): Unit = {
    require(other.cells == cells && other.cap == cap,
      "SatCountSketch.merge: shape mismatch")
    if (other.data == null) return
    if (data == null) { data = other.data; return }
    val a = data
    val b = other.data
    val capSpread = cap.toLong * 0x1111111111111111L
    val addC = (8L - cap) * 0x1111111111111111L
    val hiBits = 0x8888888888888888L
    var i = 0
    while (i < a.length) {
      val s = a(i) + b(i) // lanes ≤ 2·cap ≤ 14: no cross-lane carry
      val t = (s + addC) & hiBits // bit3 set per lane iff lane ≥ cap
      val m = t | (t >>> 1) | (t >>> 2) | (t >>> 3)
      a(i) = (s & ~m) | (capSpread & m)
      i += 1
    }
  }
}

/** `atLeast` over the BROADCAST sketch as a native codegen predicate —
  * the [[BloomMightContainBroadcast]] pattern: the expression
  * serializes as just the broadcast handle; every row probes the
  * block-manager-resident array inside whole-stage codegen. */
case class SatCountAtLeast(
    bc: Broadcast[SatCountSketch],
    floor: Int,
    child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "count_floor_at_least"

  override def nullSafeEval(input: Any): Any =
    bc.value.atLeast(input.asInstanceOf[Long], floor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[SatCountSketch].getName
    val bcRef = ctx.addReferenceObj("countFloorBc", bc)
    defineCodeGen(ctx, ev, c =>
      s"(($cls) $bcRef.value()).atLeast($c, $floor)")
  }

  override protected def withNewChildInternal(newChild: Expression): SatCountAtLeast =
    copy(child = newChild)
}
