package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import graft.SparkTestBase
import graft.queries.CurationQueries

/** q143's two plan forms and the edge cases ADVICE r13 flagged: the
  * fused conditional-count pivot and the unfused two-dim join form must
  * be bit-identical where both apply; the queries entry must survive an
  * empty documents table, a zero-token source, a >256-wide source dim
  * (fallback form), and source names containing SQL-literal metachars.
  */
class KlMixtureFormsSpec extends SparkTestBase {
  import spark.implicits._

  private val q143 = CurationQueries.queries("q143_kl_mixture")

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("klmix").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rowsOf(df: DataFrame): Seq[Row] =
    df.collect().toIndexedSeq

  test("fused and joined forms are bit-identical on the real corpus") {
    val srcs = graft.Tables.documents(spark, sf001)
      .select(col("source")).distinct().orderBy(col("source"))
      .collect().map(_.getString(0)).toIndexedSeq
    assert(srcs.nonEmpty && srcs.size <= 256)
    val fused = rowsOf(CurationQueries.klMixtureFused(spark, sf001, srcs))
    val joined = rowsOf(CurationQueries.klMixtureJoined(spark, sf001))
    assert(fused == joined)
  }

  test("zero-token source emits no row (oracle derives sources from tokens)") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta alpha", "web"),
      (2L, "beta gamma", "web"),
      (3L, "1234 5678 --", "numbers-only"), // tokenizes to nothing
      (4L, "alpha alpha", "books")))
    val out = rowsOf(q143(spark, dir))
    assert(out.map(_.getString(0)) == Seq("books", "web"))
    assert(out.forall(_.getLong(1) > 0))
  }

  test("empty documents table returns an empty result, not an error") {
    val dir = writeDocs(Seq.empty)
    val df = q143(spark, dir)
    assert(df.columns.toSeq ==
      Seq("source", "n_tokens", "n_types", "kl_1e6"))
    assert(df.count() == 0)
  }

  test("a >256-wide source dim falls back to the join form and agrees") {
    val az = "abcdefghijklmnopqrstuvwxyz"
    val rows = (0 until 300).map { i =>
      // letter-only unique token — digits would be stripped by the
      // [^a-z]+ tokenizer, collapsing every source onto the same vocab
      (i.toLong, s"u${az(i % 26)}${az(i / 26)} common word", s"src$i")
    }
    val dir = writeDocs(rows)
    val out = rowsOf(q143(spark, dir))
    assert(out.size == 300)
    // every source has 3 tokens, 3 types; spot-check the KL term sign
    assert(out.forall(r => r.getLong(1) == 3 && r.getLong(2) == 3))
    // the unique tok$i inflates c_st/n_s vs c_gt/n_g → positive KL
    assert(out.forall(_.getLong(3) > 0))
  }

  test("source names with quotes and backslashes survive verbatim") {
    val tricky = Seq("it's a source", """back\slash""", """quote'n\mix""")
    val dir = writeDocs(tricky.zipWithIndex.map { case (s, i) =>
      (i.toLong, s"word$i shared shared", s)
    })
    val out = rowsOf(q143(spark, dir))
    assert(out.map(_.getString(0)) == tricky.sorted)
  }
}
