package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r15 A/B for q153_exact_repeats. OLD = the r14 body verbatim
  * (string-class checkpoint, string dup agg, string BHJ probe). The
  * candidates keep the exact window-STRING equivalence classes but move
  * the per-position machinery onto verified 64-bit hashes (the
  * ExactSpans.assignClasses discipline: injectivity is PROVEN on this
  * dataset inside the run, never assumed):
  *  - narrow: OLD minus the unused pos column in the checkpoint
  *  - hashed: checkpoint (doc_id, cls, h); ONE groupBy(h, cls) string
  *    agg doubles as dup-count AND injectivity proof (max classes per
  *    h must be 1); probe join + broadcast on longs
  *  - twopass: checkpoint only (doc_id, h) 16-byte rows; verification
  *    re-derives the window strings in a second pass
  * Interleaved A,B,C,D per rep, equality-gated first.
  * Usage: runMain graft.tools.ExactRepProbe [sfDir] [reps]
  */
object ExactRepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-exactrep-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def classes(s: SparkSession, d: String): DataFrame =
      graft.operators.ExactSpans.windowClasses(
        Tables.spread(Tables.documents(s, d)), "text", 12)

    // the pre-r15 direct path verbatim (interpreted HOF window build)
    def classesOld(s: SparkSession, d: String): DataFrame = {
      val L = 12
      val toksCol = filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "")
      Tables.spread(Tables.documents(s, d)).withColumn("__t", toksCol)
        .select(col("doc_id"), posexplode(when(size(col("__t")) >= L, expr(
          s"transform(sequence(0, size(__t) - $L), " +
            s"i -> array_join(slice(__t, i + 1, $L), chr(31)))"))
          .otherwise(expr("array()").cast("array<string>")))
          .as(Seq("pos", "cls")))
    }

    def perDoc(cls: DataFrame, dup: DataFrame, key: String): DataFrame =
      cls.join(dup, Seq(key), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          count(col("n_occ")).as("n_dup_pos"),
          coalesce(max(col("n_occ")), lit(0L)).as("max_occ"))
        .orderBy(col("doc_id"))

    def oldQ(s: SparkSession, d: String): DataFrame = {
      val cls = classesOld(s, d).localCheckpoint(true)
      val dup = cls.groupBy(col("cls"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
      perDoc(cls, dup, "cls")
    }

    def narrowQ(s: SparkSession, d: String): DataFrame = {
      val cls = classes(s, d).select(col("doc_id"), col("cls"))
        .localCheckpoint(true)
      val dup = cls.groupBy(col("cls"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
      perDoc(cls, dup, "cls")
    }

    def hashedQ(s: SparkSession, d: String): DataFrame = {
      val ck = classes(s, d)
        .select(col("doc_id"), col("cls"), xxhash64(col("cls")).as("h"))
        .localCheckpoint(true)
      val g = ck.groupBy(col("h"), col("cls")).agg(count(lit(1)).as("cnt"))
      val gh = g.groupBy(col("h"))
        .agg(sum(col("cnt")).as("n_occ"), count(lit(1)).as("ncls"))
        .localCheckpoint(true)
      val coll = gh.agg(max(col("ncls"))).head().getLong(0)
      require(coll == 1L, s"xxhash64 collision on window classes ($coll)")
      val dup = gh.filter(col("n_occ") >= 2).select(col("h"), col("n_occ"))
      perDoc(ck.select(col("doc_id"), col("h")), dup, "h")
    }

    def twopassQ(s: SparkSession, d: String): DataFrame = {
      val ck = classes(s, d)
        .select(col("doc_id"), xxhash64(col("cls")).as("h"))
        .localCheckpoint(true)
      val ver = classes(s, d)
        .select(col("cls"), xxhash64(col("cls")).as("h")).distinct()
        .agg(count(lit(1)).as("np"), countDistinct(col("h")).as("nh")).head()
      require(ver.getLong(0) == ver.getLong(1), "xxhash64 collision")
      val dup = ck.groupBy(col("h"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
      perDoc(ck, dup, "h")
    }

    def headQ(): DataFrame =
      graft.SparkEntry.queries("q153_exact_repeats")(spark, sfDir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old" -> (() => oldQ(spark, sfDir)),
      "head" -> (() => headQ()),
      "narrow" -> (() => narrowQ(spark, sfDir)),
      "hashed" -> (() => hashedQ(spark, sfDir)),
      "twopass" -> (() => twopassQ(spark, sfDir)))

    // plan artifacts for plans/r15: the final q153 plan starts at the
    // checkpoint's ExistingRDD, so the window-build expression lives in
    // the CHECKPOINT SUBTREE — dump that stream's plan before/after
    sys.env.get("EXACTREP_PLAN_DIR").foreach { dir =>
      def planOf(df: DataFrame): String =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/q153_window_stream_before.txt"),
        planOf(classesOld(spark, sfDir)))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/q153_window_stream_after.txt"),
        planOf(classes(spark, sfDir)))
      println(s"[exactrep] plans written to $dir")
    }

    // equality gate
    val ref = oldQ(spark, sfDir).collect().map(_.toString).sorted
    for ((n, mk) <- variants.drop(1)) {
      val got = mk().collect().map(_.toString).sorted
      require(ref.sameElements(got), s"$n diverges from old")
      println(s"[exactrep] $n == old (${ref.length} rows)")
    }

    // stage decomposition, one-off: window-string stream alone
    def time(mk: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      org.apache.spark.sql.graftbridge.Bridge.renderSort(mk)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timeRaw(mk: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timeRaw(classes(spark, sfDir)); timeRaw(classesOld(spark, sfDir))
    val streamT = (1 to 3).map(_ => timeRaw(classes(spark, sfDir))).min
    val streamOldT = (1 to 3).map(_ => timeRaw(classesOld(spark, sfDir))).min
    println(f"[exactrep] stream-only: HOF $streamOldT%.3f s, kernel $streamT%.3f s")

    def report(name: String, ts: Seq[Double]): Unit = {
      val s = ts.sorted
      println(f"[exactrep] $name%-8s best ${s.head}%.3f  median ${s(s.size / 2)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    variants.foreach { case (_, mk) => time(mk()) } // cold
    val acc = variants.map(_ => Array.newBuilder[Double])
    (1 to reps).foreach { _ =>
      variants.zipWithIndex.foreach { case ((_, mk), i) => acc(i) += time(mk()) }
    }
    variants.zipWithIndex.foreach { case ((n, _), i) => report(n, acc(i).result()) }
    spark.stop()
  }
}
