package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming type-2 SCD versioner — the continuous form of
  * [[graft.operators.Scd2.build]], the shape a CDC-fed warehouse (the
  * reference's webhook/PubSub consumers,
  * `reference/internal/binwatch/blsenderwork/blsenderwork.go:182-197`)
  * actually runs: change events land continuously and the dimension's
  * version rows must stay current without rebuilding history.
  *
  * Output is an append-only CHANGELOG of version rows: a version emits
  * an OPEN row (`eff_to` NULL) the moment it opens, and a CLOSE row
  * (`eff_to` set) the moment its successor opens or a delete lands.
  * Downstream applies it with last-wins per (entity, eff_from) — a
  * close row always supersedes its open row — which is exactly a
  * streaming MERGE key. [[StreamingScd2.applyChangelog]] is that merge, used by
  * the spec to prove stream ≡ batch.
  *
  * Batch parity under out-of-order arrival (the
  * [[StatefulOps.funnelStages]] discipline): events are buffered until
  * the WATERMARK finalizes them, then applied in (ts, tie) order — so a
  * late-but-admissible event in a later micro-batch opens its version
  * in the right place instead of corrupting the run-length collapse,
  * and version numbers already emitted never need renumbering (the
  * append-mode contract: an emitted row is final except for its own
  * close). Inadmissible events (ts already behind the watermark on
  * arrival) are dropped, as in every watermarked operator.
  *
  * Scale shape: state per entity is the current-version triple (value,
  * version, eff_from) plus the in-flight buffer (bounded by watermark
  * delay × the entity's change rate) — state is proportional to LIVE
  * entities, not history. A DELETE closes the current version and, once
  * the buffer drains, REMOVES the entity's state entirely: a deleted
  * dimension member costs nothing forever after. A re-inserted entity
  * begins a new version lineage at 1 (its state was dropped — the
  * price of bounded state; (entity, eff_from) remains the stable
  * business key across lifetimes).
  */
object StreamingScd2 {

  /** One change event. `delete` = true closes the entity (CDC DELETE). */
  case class Scd2Change(entity: Long, ts: Timestamp, tie: Long,
      value: String, delete: Boolean = false)

  /** Changelog row: `eff_to` NULL = version opened, set = version
    * closed. Last-wins per (entity, version). */
  case class Scd2Version(entity: Long, value: String, version: Long,
      eff_from: Timestamp, eff_to: Timestamp)

  /** Buffered not-yet-finalized change (encoder-visible, hence public
    * like [[StatefulOps.PendEv]] — a private constructor breaks the
    * generated state serializer). */
  case class Pend(ts: Long, tie: Long, value: String, delete: Boolean)

  /** Per-entity state: not-yet-finalized events + the open version.
    * `open` distinguishes "no current version" from "current value is
    * NULL" (a NULL tracked value is legal — the q129/ADVICE case). */
  case class St(pending: List[Pend], open: Boolean,
      curValue: String, curVersion: Long, curFrom: Long)

  /** The versioner. One shuffle on the entity key; everything else is
    * per-key state-store work. */
  def versions(spark: SparkSession, changes: Dataset[Scd2Change],
      watermarkDelay: String): Dataset[Scd2Version] = {
    import spark.implicits._
    changes
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.entity)
      .flatMapGroupsWithState[St, Scd2Version](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (entity: Long, rows: Iterator[Scd2Change], state: GroupState[St]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(St(Nil, open = false, null, 0L, 0L))
          val pending =
            if (state.hasTimedOut) prev.pending
            else prev.pending ++ rows
              .filter(_.ts.getTime >= wm) // drop inadmissible stragglers
              .map(c => Pend(c.ts.getTime, c.tie, c.value, c.delete))
          // STRICT boundary (r10 review fix): ts == wm stays admissible
          // for later batches (the >= filter above), so finalizing it
          // now would let a same-instant lower-tie arrival apply AFTER
          // it — out of (ts, tie) order. Events at the watermark hold
          // until the watermark passes them.
          val (ripe, hold) = pending.partition(_.ts < wm)
          val emits = List.newBuilder[Scd2Version]
          var (open, curV, curN, curFrom) =
            (prev.open, prev.curValue, prev.curVersion, prev.curFrom)
          for (e <- ripe.sortBy(p => (p.ts, p.tie))) {
            if (e.delete) {
              if (open) {
                emits += Scd2Version(entity, curV, curN,
                  new Timestamp(curFrom), new Timestamp(e.ts))
                open = false; curN = 0L; curV = null
              } // delete on a closed/absent entity: no-op
            } else if (!open) {
              open = true; curV = e.value; curN += 1; curFrom = e.ts
              emits += Scd2Version(entity, curV, curN, new Timestamp(curFrom), null)
            } else if (!(if (curV == null) e.value == null else curV == e.value)) {
              // NULL-safe run-length collapse, matching Scd2.build's <=>
              emits += Scd2Version(entity, curV, curN,
                new Timestamp(curFrom), new Timestamp(e.ts))
              curV = e.value; curN += 1; curFrom = e.ts
              emits += Scd2Version(entity, curV, curN, new Timestamp(curFrom), null)
            } // equal value: collapsed, nothing emitted
          }
          if (hold.isEmpty && !open) {
            // closed entity, buffer drained: state removed entirely
            if (state.exists) state.remove()
          } else {
            state.update(St(hold, open, curV, curN, curFrom))
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(math.max(hold.map(_.ts).min, wm + 1))
          }
          emits.result().iterator
      }
  }

  /** Materialize a changelog into the dimension table: last-wins per
    * (entity, version, eff_from) — a close row supersedes its own open
    * row. The key needs all three parts (r10 review fix): eff_from
    * alone collapses SAME-INSTANT versions (two changes at one ts,
    * ordered by the tie column, share eff_from — the q134 zero-width
    * case — and the v2 open row would vanish under the v1 close row);
    * version alone collides across lifetimes (numbers restart at 1
    * after a delete). The one remaining degenerate key collision — a
    * delete AND a re-open at the SAME instant, i.e. (entity, version 1,
    * same eff_from) twice across lifetimes — is documented as
    * unsupported (batch parity is undefined there too: Scd2.build has
    * no delete events). This is the batch form of the downstream
    * streaming MERGE; the spec runs it over the collected changelog and
    * asserts equality with [[graft.operators.Scd2.build]]. One window
    * shuffle on the merge key (the q62 merge-on-read shape). */
  def applyChangelog(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("entity"), col("version"), col("eff_from"))
      .orderBy(col("eff_to").asc_nulls_last)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
