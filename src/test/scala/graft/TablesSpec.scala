package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Pins the `events` ts-normalization contract (Tables.events scaladoc):
  * exact integral nanos→micros division, and NTZ-footer interpretation
  * that is independent of spark.sql.session.timeZone. */
class TablesSpec extends SparkTestBase {

  test("Canon.divL is exact above 2^53 where double division rounds") {
    import spark.implicits._
    // 1.7e18-ish nanos chosen so the double-rounded quotient differs
    // from the integral one (long→double loses the low ~7 bits here).
    val ns = Seq(1700000000000000123L, 1700000000000001999L,
      1699999999999999999L, 9007199254740993001L)
    val df = ns.toDF("ns")
    val got = df.select(Canon.divL(col("ns"), 1000L).as("q")).as[Long].collect()
    assert(got.toSeq == ns.map(_ / 1000L))
    // And demonstrate the old pattern really was lossy for at least one
    // of these (guards against the test silently testing nothing).
    val lossy = df.select((col("ns") / 1000L).cast("long").as("q")).as[Long].collect()
    assert(lossy.toSeq != ns.map(_ / 1000L),
      "double division unexpectedly exact — fixture values need updating")
  }

  test("NTZ events schema normalizes to the same epoch in any session time zone") {
    val dir = Files.createTempDirectory("graft-ntz-events").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    // Write an events file whose ts is TIMESTAMP_NTZ micros. The wall
    // clock is DEFINED as UTC by the writer (Tables.events contract).
    spark.sql(
      """SELECT timestamp_ntz'2024-03-10 07:30:15.123456' AS ts, 42L AS user_id,
        |       'click' AS kind UNION ALL
        |SELECT timestamp_ntz'2024-11-03 01:30:00.000001', 43L, 'view'
        |""".stripMargin)
      .write.mode("overwrite").parquet(s"$path/events.parquet")

    def epochs(tz: String): Seq[(Long, Timestamp)] = {
      // A FRESH session (newSession shares the relation cache key by
      // instance, so each tz gets its own plan) with a non-UTC zone.
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.session.timeZone", tz)
      val df = Tables.events(s2, path)
      df.select(col("ts"), col("ts_t")).orderBy("ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    }

    // 2024-03-10 07:30:15.123456 UTC / 2024-11-03 01:30:00.000001 UTC —
    // both inside US DST-transition windows, the worst case for any
    // zone-dependent interpretation.
    def utcNanos(s: String): Long = {
      val i = java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000000L + i.getNano
    }
    val utc = epochs("UTC")
    assert(utc.map(_._1) == Seq(
      utcNanos("2024-03-10T07:30:15.123456"), utcNanos("2024-11-03T01:30:00.000001")))
    for (tz <- Seq("America/Los_Angeles", "Asia/Kolkata", "Australia/Lord_Howe")) {
      assert(epochs(tz) == utc, s"events normalization diverged under $tz")
    }
  }
}
