package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TokenWindowStrings.tokenWindowStrings

/** The fused window kernel must equal the HOF chain
  * `when(size(t) >= L, transform(sequence(0, size(t)-L),
  * i -> array_join(slice(t, i+1, L), chr(31)))).otherwise(array())`
  * on every null-free token array — that identity is what keeps the
  * q153 exact-repeat classes verbatim-string-exact. */
class TokenWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofChain(l: Int) =
    when(size(col("t")) >= l, expr(
      s"transform(sequence(0, size(t) - $l), " +
        s"i -> array_join(slice(t, i + 1, $l), chr(31)))"))
      .otherwise(expr("array()").cast("array<string>"))

  test("kernel equals the HOF chain on random token arrays (L = 1, 2, 12)") {
    val rnd = new scala.util.Random(13)
    def tok() = Seq.fill(rnd.nextInt(6) + 1)(('a' + rnd.nextInt(26)).toChar).mkString
    val rows = Seq.fill(300)(Seq.fill(rnd.nextInt(30))(tok())) ++ Seq(
      Seq.empty[String],              // empty doc
      Seq("a"),                       // single token
      Seq("", "a", ""),               // empty tokens (byte-level join)
      Seq.fill(12)("x"),              // exactly L tokens at L=12
      Seq.fill(11)("x"))              // one short of L=12
    val df = rows.toDF("t")
    for (l <- Seq(1, 2, 12)) {
      val bad = df.select(
          tokenWindowStrings(col("t"), l).as("k"), hofChain(l).as("c"))
        .filter(col("k") =!= col("c")).collect()
      assert(bad.isEmpty, s"L=$l: ${bad.take(3).mkString("\n")}")
    }
  }

  test("kernel propagates null input arrays") {
    val got = Seq(Some(Seq("a", "b")), None).toDF("t")
      .select(tokenWindowStrings(col("t"), 2)).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }
}
