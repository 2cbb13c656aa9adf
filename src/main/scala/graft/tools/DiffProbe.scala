package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q138 snapshot-diff decomposition (r12 verdict item 1): same-session
  * interleaved A/B of the diff plan shapes on the q138 inputs —
  *
  *   fp_scan : the two fingerprint scans alone (the irreducible input
  *             cost: scan + render + hash, no wide exchange)
  *   join    : the r12 shape — per-side repartition + full-outer
  *             SortMergeJoin + status classification + the q138 agg
  *   fused   : the r13 shape — tagged union + ONE repartition + hash
  *             aggregation pivot (no sorts) + the q138 agg
  *
  * Interleaved warm best-of-3 in one JVM, so host bimodality cancels;
  * also cross-checks that both shapes produce identical per-class
  * counts before timing.
  *
  * Usage: runMain graft.tools.DiffProbe [sfDir] [runs]
  */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-diff-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def inputs(): (DataFrame, DataFrame) = {
      val o = Tables.orders(spark, sfDir)
      val older = o.filter(col("o_orderkey") % 10 =!= 3)
      val newer = o.filter(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      (older, newer)
    }

    // the pre-r13 fingerprint (kept verbatim here for the A side)
    def fingerprint(df: DataFrame, keyCol: String): DataFrame = {
      val payload = df.columns.filter(_ != keyCol).sorted.map { c =>
        coalesce(concat(length(col(c).cast("string")).cast("string"),
          lit(":"), col(c).cast("string")), lit("\u0000"))
      }
      df.select(col(keyCol).as("k"),
        graft.functions.Fnv1aHash.fnv1a64(
          concat_ws("\u0001", payload.toIndexedSeq: _*)).as("fp"))
    }

    // candidate r13 fingerprint: native xxhash64 chain, no string
    // materialization; each nullable column contributes an explicit
    // null-flag so (x, NULL) and (NULL, x) cannot alias (xxhash64 skips
    // NULL inputs, leaving the accumulator unchanged)
    def fingerprintFast(df: DataFrame, keyCol: String): DataFrame = {
      // the flag stream makes the contribution sequence uniquely
      // decodable, so the skipped-NULL column needs no typed default
      val payload = df.columns.filter(_ != keyCol).sorted.flatMap { c =>
        Seq(col(c).isNull.cast("int"), col(c))
      }
      df.select(col(keyCol).as("k"),
        xxhash64(payload.toIndexedSeq: _*).as("fp"))
    }

    def classify(d: DataFrame): DataFrame =
      d.select(col("k"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("deleted"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), sum(col("k") % 997).as("k_checksum"))
        .orderBy(col("status"))

    val p = spark.sparkContext.defaultParallelism

    def joinShape(): DataFrame = {
      val (older, newer) = inputs()
      val a = fingerprint(older, "o_orderkey").withColumnRenamed("fp", "fp_old")
        .repartition(p, col("k"))
      val b = fingerprint(newer, "o_orderkey").withColumnRenamed("fp", "fp_new")
        .repartition(p, col("k"))
      classify(a.join(b, Seq("k"), "full_outer"))
    }

    def fusedShape(): DataFrame = {
      val (older, newer) = inputs()
      classify(
        fingerprint(older, "o_orderkey").withColumn("side", lit(0))
          .unionByName(
            fingerprint(newer, "o_orderkey").withColumn("side", lit(1)))
          .repartition(p, col("k"))
          .groupBy(col("k"))
          .agg(max(when(col("side") === 0, col("fp"))).as("fp_old"),
            max(when(col("side") === 1, col("fp"))).as("fp_new")))
    }

    def fpScan(): DataFrame = {
      val (older, newer) = inputs()
      fingerprint(older, "o_orderkey").withColumn("side", lit(0))
        .unionByName(fingerprint(newer, "o_orderkey").withColumn("side", lit(1)))
        .select(xxhash64(col("k"), col("fp"), col("side")).as("h"))
        .agg(expr("bit_xor(h)").as("s"))
    }

    // answers must match before any timing means anything
    val aRows = joinShape().collect().map(_.toString).toSeq
    val bRows = fusedShape().collect().map(_.toString).toSeq
    require(aRows == bRows,
      s"shape answers diverge:\nA=$aRows\nB=$bRows")
    println(s"[diff-probe] answers identical across shapes: $aRows")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // both input scans alone (filter + key projection, no fingerprint):
    // the floor under ANY diff plan that must read both snapshots
    def scanOnly(): DataFrame = {
      val (older, newer) = inputs()
      older.select(col("o_orderkey").as("k"))
        .unionByName(newer.select(col("o_orderkey").as("k")))
        .select(xxhash64(col("k")).as("h"))
        .agg(expr("bit_xor(h)").as("s"))
    }

    def fpScanFast(): DataFrame = {
      val (older, newer) = inputs()
      fingerprintFast(older, "o_orderkey").withColumn("side", lit(0))
        .unionByName(fingerprintFast(newer, "o_orderkey").withColumn("side", lit(1)))
        .select(xxhash64(col("k"), col("fp"), col("side")).as("h"))
        .agg(expr("bit_xor(h)").as("s"))
    }

    def joinFast(): DataFrame = {
      val (older, newer) = inputs()
      val a = fingerprintFast(older, "o_orderkey").withColumnRenamed("fp", "fp_old")
        .repartition(p, col("k"))
      val b = fingerprintFast(newer, "o_orderkey").withColumnRenamed("fp", "fp_new")
        .repartition(p, col("k"))
      classify(a.join(b, Seq("k"), "full_outer"))
    }

    def fusedFast(): DataFrame = {
      val (older, newer) = inputs()
      classify(
        fingerprintFast(older, "o_orderkey").withColumn("side", lit(0))
          .unionByName(
            fingerprintFast(newer, "o_orderkey").withColumn("side", lit(1)))
          .repartition(p, col("k"))
          .groupBy(col("k"))
          .agg(max(when(col("side") === 0, col("fp"))).as("fp_old"),
            max(when(col("side") === 1, col("fp"))).as("fp_new")))
    }

    val cFast = fusedFast().collect().map(_.toString).toSeq
    require(cFast == aRows, s"fast-fingerprint answers diverge:\n$cFast\nvs $aRows")
    println("[diff-probe] fast-fingerprint answers identical")

    val shapes = Seq(
      "scan_only" -> (() => noop(scanOnly())),
      "fp_scan" -> (() => noop(fpScan())),
      "join" -> (() => noop(joinShape())),
      "fused" -> (() => noop(fusedShape())),
      "fp_scan_fast" -> (() => noop(fpScanFast())),
      "join_fast" -> (() => noop(joinFast())),
      "fused_fast" -> (() => noop(fusedFast())))
    // one cold pass each, then interleaved warm rounds
    shapes.foreach { case (n, f) => println(f"[diff-probe] $n cold: ${time(f())}%.3f s") }
    val best = collection.mutable.Map.empty[String, Double]
    (1 to runs).foreach { r =>
      shapes.foreach { case (n, f) =>
        val t = time(f())
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
        println(f"[diff-probe] $n round $r: $t%.3f s")
      }
    }
    println("[diff-probe] best: " + shapes.map { case (n, _) =>
      f"$n=${best(n)}%.3f" }.mkString(" "))
    spark.stop()
  }
}
