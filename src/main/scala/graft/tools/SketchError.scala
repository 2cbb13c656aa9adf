package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fnv1aHash
import graft.operators.CountMin

/** Approx-sketch ERROR ledger (r9 verdict item 8): the oracled queries
  * (q42/q52/q112/q126/q127) prove the sketches' determinism and merge
  * laws; this probe measures their ACCURACY — observed error against
  * the published guarantee — so BASELINE.md can track it round-over-
  * round instead of only tracking that the sketch is reproducible.
  *
  * Measured at the given SF dir (default sf0.1):
  *  - HLL (`approx_count_distinct`, rsd 0.05) on lineitem.l_partkey:
  *    observed |approx−exact|/exact vs the requested rsd.
  *  - KMV k=256 (q52's estimator) on the same column: observed relative
  *    error vs the sketch's theoretical rsd 1/√(k−2).
  *  - Per-group KMV k=64 (q126): max/mean group relative error vs
  *    1/√(k−2) (saturated groups report exactly and are excluded).
  *  - Count-Min 4×512 (q112's grid) on lineitem.l_suppkey: max/mean
  *    overestimate over ALL distinct keys vs the ε·N bound
  *    (ε = e/width), plus the fraction of keys above the bound, which
  *    the guarantee caps at δ = e^−depth per key.
  *
  * Prints one JSON line — paste into BASELINE.md's ledger table.
  */
object SketchError {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("sketch-error")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir).cache()

    // --- HLL ---------------------------------------------------------
    val Array(exact, hll) = li
      .agg(countDistinct(col("l_partkey")).cast("double"),
        approx_count_distinct(col("l_partkey"), 0.05).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val hllErr = math.abs(hll - exact) / exact

    // --- KMV global (q52 algebra, k = 256) ---------------------------
    val two64 = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
    def uh = {
      val h = Fnv1aHash.fmix64(Fnv1aHash.fnv1a64(col("l_partkey").cast("string")))
      when(h < 0, h.cast("decimal(21,0)") + lit(two64))
        .otherwise(h.cast("decimal(21,0)"))
    }
    val k = 256
    val kmvEst = li.select(uh.as("uh")).distinct()
      .orderBy(col("uh")).limit(k)
      .agg(max(col("uh")).as("hk")).head()
      .getDecimal(0).doubleValue() match {
        case hk => (k - 1).toDouble * math.pow(2, 64) / hk
      }
    val kmvErr = math.abs(kmvEst - exact) / exact
    val kmvRsd = 1.0 / math.sqrt((k - 2).toDouble)

    // --- KMV per group (q126 algebra, k = 64) ------------------------
    val kg = 64
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("uh"))
    val groupErrs = li.select(col("l_returnflag"), uh.as("uh"),
        col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_n"))
      .join(
        li.select(col("l_returnflag"), uh.as("uh")).distinct()
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= kg)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_kept"), max(col("uh")).as("hk")),
        "l_returnflag")
      .filter(col("n_kept") === kg) // saturated groups are exact
      .select(abs(lit((kg - 1).toDouble * math.pow(2, 64))
          / col("hk").cast("double") - col("exact_n").cast("double"))
        / col("exact_n").cast("double"))
      .collect().map(_.getDouble(0))
    val kgRsd = 1.0 / math.sqrt((kg - 2).toDouble)

    // --- Count-Min (q112 grid: depth 4, width 512) -------------------
    val width = 512
    val sketch = CountMin.build(li, col("l_suppkey"), lit(1L), width)
    val truth = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_cnt"))
    val est = CountMin.estimate(sketch, truth, "l_suppkey", width)
    val n = li.count().toDouble
    val eps = math.E / width
    val bound = eps * n
    val over = est.select((col("cm_est") - col("exact_cnt")).cast("double").as("ov"))
      .agg(max(col("ov")), avg(col("ov")),
        avg(when(col("ov") > bound, 1.0).otherwise(0.0)),
        count(lit(1)))
      .head()
    val delta = math.exp(-CountMin.RowParams.size.toDouble)

    def f(x: Double) = f"$x%.6f"
    println(s"""{"sf_dir":"$dir","hll":{"exact":${exact.toLong},"approx":${hll.toLong},"rel_err":${f(hllErr)},"rsd_requested":0.05},""" +
      s""""kmv_k256":{"est":${kmvEst.toLong},"rel_err":${f(kmvErr)},"rsd_theory":${f(kmvRsd)}},""" +
      s""""kmv_group_k64":{"n_groups":${groupErrs.length},"max_rel_err":${f(groupErrs.max)},"mean_rel_err":${f(groupErrs.sum / groupErrs.length)},"rsd_theory":${f(kgRsd)}},""" +
      s""""countmin_4x512":{"n_rows":${n.toLong},"n_keys":${over.getLong(3)},"eps_n_bound":${f(bound)},"max_over":${f(over.getDouble(0))},"mean_over":${f(over.getDouble(1))},"frac_above_bound":${f(over.getDouble(2))},"delta_guarantee":${f(delta)}}}""")
    spark.stop()
  }
}
