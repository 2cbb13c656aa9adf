package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{LineDedup, TableDiff}

/** Stage decomposition for the two round-10 curation queries whose
  * bench ratios exceed 2× (q137 line dedup, q149 diff→apply): times
  * each cumulative prefix of the pipeline so the e2e number can be
  * read as a stage sum — the FloorProbe protocol. Findings land in
  * BASELINE.md.
  *
  * Usage: runMain graft.tools.CurationProbe [sfDir] [runs]
  */
object CurationProbe {

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }
  private def warmBest(runs: Int)(fn: => Unit): Double =
    (1 to runs).map(_ => time(fn)).min
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-curation-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(name: String, t: Double): Unit =
      println(f"""{"probe":"$name","sec":$t%.3f}""")

    // ---- q137 stages ----
    val lined = LineDedup.withChunkedLines(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      "text", 8)
    report("q137_a_chunk_scan", warmBest(runs) {
      noop(LineDedup.lineOccurrences(lined)) })
    report("q137_b_checkpoint", warmBest(runs) {
      LineDedup.lineOccurrences(lined).localCheckpoint(true).count(); () })
    report("q137_c_survivors", warmBest(runs) {
      noop(LineDedup.survivors(lined)) })
    report("q137_d_e2e", warmBest(runs) { noop(LineDedup.rebuild(lined)) })
    // r12 fusion A/B in ONE session: the un-fused chain (chunk string
    // round-trip + second corpus scan in the rebuild join) vs
    // rebuildChunked (one scan, one tokenize, checkpointed line arrays)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    report("q137_e_unfused_e2e", warmBest(runs) {
      noop(LineDedup.rebuild(LineDedup.withChunkedLines(docs, "text", 8))) })
    report("q137_f_fused_e2e", warmBest(runs) {
      noop(LineDedup.rebuildChunked(docs, "text", 8)) })
    // fused-path sub-stages
    locally {
      val p = spark.sparkContext.defaultParallelism
      def linedOf(d: DataFrame) = d
        .withColumn("__toks", split(col("text"), " "))
        .select(col("doc_id"),
          expr("transform(sequence(0, cast((size(__toks) - 1) / 8 as int)), " +
            "i -> array_join(slice(__toks, i * 8 + 1, 8), ' '))").as("__ls"))
      report("q137_g_lined_scan_only", warmBest(runs) { noop(linedOf(docs)) })
      val occ = linedOf(docs)
        .select(col("doc_id"), posexplode(col("__ls")).as(Seq("idx", "line")))
        .select(col("doc_id"), col("idx"),
          graft.functions.Fnv1aHash.fnv1a64(col("line")).as("h"))
      report("q137_h_occ_only", warmBest(runs) { noop(occ) })
      val kept = occ.repartition(p, col("h")).groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
        .select(col("w.doc_id").as("doc_id"), col("w.idx").as("idx"))
        .repartition(p, col("doc_id"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("idx"))).as("__ki"))
      report("q137_i_kept_only", warmBest(runs) { noop(kept) })
      val keptCp = kept.localCheckpoint(true)
      report("q137_j_bcast_join_only", warmBest(runs) {
        noop(linedOf(docs).join(broadcast(keptCp), Seq("doc_id"), "left")
          .select(col("doc_id"),
            size(col("__ls")).cast("long").as("n_lines"),
            when(col("__ki").isNull, lit(""))
              .otherwise(array_join(
                transform(col("__ki"), i => element_at(col("__ls"), i + 1)),
                "\n")).as("cleaned"))) })
    }

    // ---- q149 stages ----
    val o = Tables.orders(spark, sfDir)
    val older = o.filter(col("o_orderkey") % 10 =!= 3)
    val newer = o.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
    report("q149_a_scan_both", warmBest(runs) { noop(older); noop(newer) })
    report("q149_b_diff", warmBest(runs) {
      noop(TableDiff.diff(older, newer, "o_orderkey")) })
    report("q149_c_changeset", warmBest(runs) {
      noop(TableDiff.changeSet(older, newer, "o_orderkey")) })
    report("q149_d_e2e_apply", warmBest(runs) {
      noop(TableDiff.applyChanges(older,
        TableDiff.changeSet(older, newer, "o_orderkey"), "o_orderkey")) })

    spark.stop()
    sys.exit(0)
  }
}
