package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign items (in id order) to fixed
  * token-budget bins by cumulative token count — the window formulation
  * of streaming greedy packing used to assemble training shards.
  *
  * [[pack]] runs ONE global window (total order over the whole corpus):
  * deterministic and oracle-friendly, but single-task at the window —
  * only for bounded inputs. [[packSharded]] is the production form at
  * 100 TB: the IDENTICAL window runs independently inside each hash
  * shard (`Window.partitionBy(shard)`), so work distributes across the
  * cluster, no global order exists, and a bin is addressed by
  * (shard, bin). Packing quality is unchanged — budget waste stays
  * O(1 doc) per bin — and each shard's packing is reproducible from its
  * members alone (stable under corpus growth in other shards).
  */
object SequencePacking {

  /** Cumulative-sum bin assignment over a total order of `idCol`:
    * adds `cum_before` (tokens packed before this item) and `bin`
    * (floor(cum_before / budget)). */
  def pack(items: DataFrame, idCol: String, nTokCol: String, budget: Long): DataFrame = {
    GlobalOrder.allow("SequencePacking.pack")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    items
      .withColumn("cum_before", coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget).cast("long"))
  }

  /** Per-shard packing: same cumulative window, partitioned by a
    * deterministic shard expression — the scale path. */
  def packSharded(items: DataFrame, idCol: String, nTokCol: String,
      budget: Long, shard: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    items.withColumn("shard", shard)
      .withColumn("cum_before", coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget).cast("long"))
  }
}
