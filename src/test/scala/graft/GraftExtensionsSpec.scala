package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: every custom expression must be callable from plain
  * SQL. Uses the post-hoc registration path (GraftExtensions.register)
  * because the test JVM's shared session already exists — builder
  * .withExtensions would silently no-op through getOrCreate; the
  * builder path itself is exercised by the same function table. */
class GraftExtensionsSpec extends SparkTestBase {

  private lazy val sqlSession: SparkSession = {
    GraftExtensions.register(spark)
    spark
  }
  private def sql(q: String) = sqlSession.sql(q)

  test("fnv1a64 from SQL matches the expression API") {
    val viaSql = sql("SELECT fnv1a64('mysql-bin.000001/4')").head().getLong(0)
    val direct = graft.functions.Fnv1aHash.hashUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString("mysql-bin.000001/4"))
    assert(viaSql === direct)
  }

  test("fnv1a64_long_le from SQL matches the reference position-key hash") {
    val viaSql = sql("SELECT fnv1a64_long_le(4L)").head().getLong(0)
    assert(viaSql === graft.functions.Fnv1aHash.hashLongLE(4L))
    // parity with the byte-array reference form used by Sharding
    assert(viaSql === graft.cdc.Sharding.fnv1a64(
      graft.cdc.Sharding.positionKeyBytes(4L)))
  }

  test("vector_dot / vector_norm_l2 from SQL") {
    val r = sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)), " +
        "vector_norm_l2(array(3.0d, 4.0d))").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }

  test("ngrams UDTF from SQL (lateral view)") {
    val rows = sql(
      "SELECT ngram FROM (SELECT array('a','b','c') AS toks) " +
        "LATERAL VIEW ngrams(toks, 2) t AS ngram")
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq("a b", "b c"))
  }

  test("str_poly_hash + token_span_hashes from SQL match the dedup kernels") {
    val h = sql("SELECT str_poly_hash('abc')").head().getLong(0)
    assert(h === (("a".head.toLong * 31 + 'b'.toLong) * 31 + 'c'.toLong) % 1000000007L)
    // spans of ['ab','cd','ab','cd'] with w=2: distinct {h(ab,cd), h(cd,ab)}
    val spans = sql(
      "SELECT token_span_hashes(array('ab','cd','ab','cd'), 2)")
      .head().getSeq[Long](0)
    def sh(s: String) = s.getBytes.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)
    val expect = Seq((sh("ab") * 8191 + sh("cd")) % 1000000007L,
      (sh("cd") * 8191 + sh("ab")) % 1000000007L)
    assert(spans == expect)
    // analyzer inserts casts / rejects bad types cleanly
    intercept[Exception](sql("SELECT token_span_hashes('notanarray', 2)").collect())
  }

  test("zvalue from SQL matches the scalar Morton reference") {
    val z = sql("SELECT zvalue(5L, 9L, 8)").head().getLong(0)
    assert(z === graft.operators.ZOrder.zValueRef(5L, 9L, 8))
    // analyzer-inserted casts: int inputs work too
    assert(sql("SELECT zvalue(255, 255, 8)").head().getLong(0) === 65535L)
    // bits must be a literal
    intercept[Exception](sql("SELECT zvalue(1L, 2L, id) FROM range(1)").collect())
  }

  test("render_template from SQL renders a route payload") {
    val out = sql(
      """SELECT render_template(named_struct('ItemID', 7L), '{"id":{{ .ItemID }}}')""")
      .head().getString(0)
    assert(out === """{"id":7}""")
  }
}
