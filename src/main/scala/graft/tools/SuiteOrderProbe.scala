package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.operators.TextDedup

/** Reproduction probe for the q75 suite-order sensitivity (VERDICT r6
  * "What's wrong" #2): in r5, q75_dedup_containment measured 1.21 s
  * in-suite vs 0.42 s isolated; in r6 — with zero containmentPairs
  * changes — it recovered to 0.35 s after q76 dropped its two eager
  * `localCheckpoint(true)` calls over the span-hash machinery. This
  * probe makes the mechanism reproducible on demand:
  *
  *   1. q75 warm baseline on a fresh session (Bench's session confs);
  *   2. materialize the r5-style q76 subtrees — the distinct train-span
  *      hashes and the eval spans, both eagerly localCheckpointed, so
  *      their MEMORY_AND_DISK blocks stay RESIDENT (nothing unpersists
  *      them — exactly the state a suite pass leaves behind);
  *   3. q75 warm again with those blocks resident, plus the resident
  *      block volume from getRDDStorageInfo.
  *
  * A material (2)->(3) slowdown confirms the root cause: resident
  * checkpoint storage squeezes the unified memory pool, pushing q75's
  * collect_list shingle profiles into spill/GC. The fix is structural
  * (q76 no longer checkpoints eagerly), and PlanSpec pins q75's plan
  * shape so the machinery cannot silently regain an eager
  * materialization.
  *
  * Usage: runMain graft.tools.SuiteOrderProbe [sfDir] [runs]
  */
object SuiteOrderProbe {

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-suite-order-probe")
      // Bench's session confs: the reproduction must run in the same
      // memory/partitioning regime the r5 number was measured in
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q75(): Unit = noop(
      org.apache.spark.sql.graftbridge.Bridge.renderSort(
        SparkEntry.queries("q75_dedup_containment")(spark, sfDir)))

    q75() // cold: codegen + scan warmup
    val base = (1 to runs).map(_ => time(q75())).min

    // r5's q76 shape: both span subtrees eagerly checkpointed; keep the
    // references alive so the blocks stay resident like a suite pass
    val docs = Tables.spread(Tables.documents(spark, sfDir))
    val trainH = TextDedup.spanHashes(docs.filter(col("doc_id") % 10 =!= 7), 5)
      .select(col("h").as("th_")).distinct().localCheckpoint(eager = true)
    val evalSpans = TextDedup.spanHashes(docs.filter(col("doc_id") % 10 === 7), 5)
      .localCheckpoint(eager = true)
    val residentBytes = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum
    val withResident = (1 to runs).map(_ => time(q75())).min
    // silence "unused" warnings while pinning the references
    require(trainH != null && evalSpans != null)

    println(f"""{"metric":"q75_suite_order","baseline_sec":$base%.3f,""" +
      f""""with_resident_checkpoints_sec":$withResident%.3f,""" +
      f""""resident_checkpoint_bytes":$residentBytes,""" +
      f""""slowdown":${withResident / base}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
