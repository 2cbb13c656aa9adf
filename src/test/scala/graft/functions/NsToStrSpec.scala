package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.NsToStrUtc.nsToStrUtc

/** The integer-arithmetic render kernel must equal the composable chain
  * `date_format(timestamp_micros(ns div 1000), "yyyy-MM-dd HH:mm:ss")`
  * on EVERY int64 input (UTC session) — that identity is what lets
  * Canon.nsToStr swap the per-output-row formatter in q10/q21/q26/q27/
  * q29 without touching a declared result. */
class NsToStrSpec extends SparkTestBase {
  import spark.implicits._

  private def chain = date_format(
    graft.Canon.nsToMicros(col("ns")), "yyyy-MM-dd HH:mm:ss")

  test("kernel equals the date_format chain across the full int64 domain") {
    val rnd = new scala.util.Random(42)
    val edges = Seq(
      Long.MinValue, Long.MinValue + 1, Long.MaxValue, Long.MaxValue - 1,
      0L, 1L, -1L, 999L, -999L, 1000L, -1000L, 999999999L, -999999999L,
      1000000000L, -1000000000L,
      // leap-day and century boundaries (2000-02-29, 2024-02-29,
      // 2100 non-leap is outside int64-ns range on the high side only
      // for +292y — include nearby decade boundaries instead)
      951782400L * 1000000000L + 1, // 2000-02-29 00:00:00.000000001
      1709164800L * 1000000000L,    // 2024-02-29
      -86400L * 1000000000L,        // 1969-12-31
      -1L * 1000000000L - 1)        // 1969-12-31 23:59:58.999999999
    val randoms = Seq.fill(5000)(rnd.nextLong())
    val df = (edges ++ randoms).toDF("ns")
    val bad = df.select(col("ns"), nsToStrUtc(col("ns")).as("k"), chain.as("c"))
      .filter(col("k") =!= col("c") || col("k").isNull || col("c").isNull)
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("kernel propagates null") {
    val got = Seq(Some(0L), None).toDF("ns")
      .select(nsToStrUtc(col("ns"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(got.toSeq === Seq(Some("1970-01-01 00:00:00"), None))
  }

  test("interpreted eval matches codegen (the spec above runs codegen)") {
    // force the interpreted path via direct calls
    val vals = Seq(0L, 1234567890123456789L, -1234567890123456789L,
      Long.MinValue, Long.MaxValue)
    val viaExpr = vals.map(v => NsToStrUtc.format(v).toString)
    val viaSpark = vals.toDF("ns")
      .select(nsToStrUtc(col("ns"))).collect().map(_.getString(0)).toSeq
    assert(viaExpr === viaSpark)
  }
}
