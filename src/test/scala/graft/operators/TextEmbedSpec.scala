package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextEmbedSpec extends SparkTestBase {

  test("double form is exactly the fixed-point sums / 1000") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma"), (3L, "  !! 123 "))
      .toDF("doc_id", "text")
    val fp = TextEmbed.embedFixedPoint(docs, "text", 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getLong(i))).toMap
    val db = TextEmbed.embed(docs, "text", 4).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("emb")).toMap
    assert(fp.keySet == Set(1L, 2L)) // token-free doc 3 drops on both forms
    assert(db.keySet == Set(1L, 2L))
    for (id <- fp.keySet; d <- 0 until 4)
      assert(db(id)(d) == fp(id)(d).toDouble / 1000.0)
    // tf weighting: doc 1's 'alpha' contributes twice
    val one = TextEmbed.embedFixedPoint(
      Seq((9L, "alpha")).toDF("doc_id", "text"), "text", 4).collect().head
    val beta = TextEmbed.embedFixedPoint(
      Seq((9L, "beta")).toDF("doc_id", "text"), "text", 4).collect().head
    for (d <- 0 until 4)
      assert(fp(1L)(d) == 2 * one.getLong(d + 1) + beta.getLong(d + 1))
  }

  test("bridge: hashed embeddings feed the vector near-dup operator") {
    // the reason the op exists — text flows into the Similarity family
    // with no external model: near-identical docs land near-identical
    // embeddings (shared tf mass), unrelated docs do not collide
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base.replace("today", "tomorrow")),
      (3L, "completely different content about spark catalyst execution plans"))
      .toDF("doc_id", "text")
    val emb = TextEmbed.embed(docs, "text", 16)
    val pairs = Similarity.nearDupPairs(emb, "doc_id", "emb", lit(0.9),
        maxRows = 1000L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs)
  }

  test("embedding is one narrow pass: no join, no window, one aggregate") {
    val s = spark
    import s.implicits._
    val plan = TextEmbed.embedFixedPoint(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "text", 16)
      .queryExecution.executedPlan
    for (bad <- Seq("Join", "Window", "CartesianProduct"))
      assert(!plan.exists(_.nodeName.contains(bad)), s"plan contains $bad")
  }
}
