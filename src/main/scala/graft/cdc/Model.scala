package graft.cdc

import org.apache.spark.sql.types._

/** CDC envelope — Spark-native form of the reference's row-change event
  * `RowEventItemT` (/root/reference/internal/pools/pools.go:17-35).
  *
  * Differences by design (SURVEY.md §1.3):
  *  - `rows` is `array<map<string,string>>` (schema-less pass-through);
  *    a declared per-table schema lifts it to typed columns via from_json.
  *  - `itemID` is optional: a global gap-free sequence is a single-writer
  *    concept (pools.go:57-74); at scale the natural identity is the
  *    composite (binlogFile, binlogPosition, rowIdx), which is also the
  *    sink idempotency key.
  */
case class BinlogMeta(eventType: String, binlogFile: String, binlogPosition: Long)

case class RowChange(database: String, table: String, operation: String,
    rows: Seq[Map[String, String]])

case class RowEvent(itemID: Long, log: BinlogMeta, data: RowChange)

object Model {
  /** Raw replay-twin input row: what the binlog reader yields before
    * decode (blreaderwork.go:195-312). UPDATE events carry interleaved
    * (before, after) row images, exactly like MySQL ROW binlog. */
  val RawEventSchema: StructType = StructType(Seq(
    StructField("eventType", StringType, nullable = false),
    StructField("binlogFile", StringType, nullable = false),
    StructField("binlogPosition", LongType, nullable = false),
    StructField("database", StringType, nullable = true),
    StructField("table", StringType, nullable = true),
    StructField("colNames", ArrayType(StringType), nullable = true),
    StructField("rows", ArrayType(ArrayType(StringType)), nullable = true)))

  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("itemID", LongType, nullable = true),
    StructField("log", StructType(Seq(
      StructField("eventType", StringType, nullable = false),
      StructField("binlogFile", StringType, nullable = false),
      StructField("binlogPosition", LongType, nullable = false))), nullable = false),
    StructField("data", StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("rows", ArrayType(MapType(StringType, StringType)), nullable = false))),
      nullable = false)))

  /** Binlog event type → DML operation (utils.go:74-90). */
  val OpByEventType: Map[String, String] = Map(
    "WriteRowsEventV2" -> "INSERT", "WriteRowsEventV1" -> "INSERT",
    "WriteRowsEvent" -> "INSERT",
    "UpdateRowsEventV2" -> "UPDATE", "UpdateRowsEventV1" -> "UPDATE",
    "UpdateRowsEvent" -> "UPDATE",
    // binlog_row_value_options=PARTIAL_JSON (event type 39); the decoder
    // reconstructs full after-images, so downstream treats it as UPDATE
    "PartialUpdateRowsEvent" -> "UPDATE",
    "DeleteRowsEventV2" -> "DELETE", "DeleteRowsEventV1" -> "DELETE",
    "DeleteRowsEvent" -> "DELETE")
}
