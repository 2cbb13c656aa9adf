package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** DataFrame-path parity for the codegen shard expressions: the
  * unsigned-mod-over-signed-hash column formula must agree with Go's
  * uint64 arithmetic (Long.remainderUnsigned) for every hash value —
  * including hashes whose sign bit is set, where a plain `%` or `pmod`
  * would diverge from the reference. */
class ShardingColumnSpec extends SparkTestBase {

  private def envelope(positions: Seq[Long]) = {
    val s = spark
    import s.implicits._
    positions.toDF("p").select(
      struct(lit("f").as("binlogFile"), col("p").as("binlogPosition")).as("log"),
      lit(1L).as("itemID"),
      struct(lit("db").as("database"), lit("t").as("table")).as("data"))
  }

  test("position-path shardId matches the scalar reference for negative-sign hashes") {
    // positions chosen so fnv1a64(LE bytes) covers both sign bits
    val positions = (0L until 512L).map(_ * 7919L + 3L)
    for (count <- Seq(2, 3, 5, 7)) {
      val got = envelope(positions)
        .select(col("log.binlogPosition").as("p"),
          Sharding.shardId(count, None, Sharding.Fnv1aParity).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      positions.foreach { p =>
        assert(got(p) == Sharding.fnvShardOfPosition(p, count),
          s"position $p count $count")
        // and the scalar itself matches Go uint64 semantics
        assert(Sharding.fnvShardOfPosition(p, count) ==
          java.lang.Long.remainderUnsigned(
            Sharding.fnv1a64(Sharding.positionKeyBytes(p)), count.toLong).toInt)
      }
    }
  }

  test("key-template shardId matches the scalar reference") {
    val s = spark
    import s.implicits._
    val keys = (1 to 256).map(i => s"row-$i")
    val df = keys.toDF("k").select(
      struct(lit("f").as("binlogFile"), lit(0L).as("binlogPosition")).as("log"),
      lit(1L).as("itemID"),
      struct(lit("db").as("database"), lit("t").as("table"),
        col("k").as("operation")).as("data"))
    for (count <- Seq(3, 8)) {
      val got = df.select(col("data.operation").as("k"),
          Sharding.shardId(count, Some("{{ .Data.Operation }}"),
            Sharding.Fnv1aParity).as("s"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      keys.foreach { k =>
        assert(got(k) == Sharding.fnvShardOfKey(k, count), s"key $k count $count")
      }
    }
  }
}
