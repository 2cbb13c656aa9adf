package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Binlog-event decode pipeline: raw rows events → CDC envelope.
  *
  * Re-expresses the reference reader's per-event loop
  * (/root/reference/internal/binwatch/blreaderwork/blreaderwork.go:195-312)
  * as a declarative plan, so Catalyst pushes the event-type and
  * watched-table predicates into the source scan:
  *
  *  - A2 event-type filter  (blreaderwork.go:308-311 default-drop)
  *  - A3 watched-table filter (blreaderwork.go:247-250)
  *  - A4 event-type → DML decode (utils.go:74-90)
  *  - A5 row materialization: zip colNames with values (blreaderwork.go:252-270)
  *  - A6 before-image elimination for UPDATE (blreaderwork.go:261-263)
  *  - A7 optional itemByRow explode (blreaderwork.go:275-295)
  *  - schema-drift policy (blreaderwork.go:255-259): fail (parity) or drop
  */
object Decode {

  sealed trait DriftPolicy
  /** Reference parity: a column-count mismatch is a hard error. */
  case object FailOnDrift extends DriftPolicy
  /** Drop drifted rows (dead-letter them upstream if needed). */
  case object DropOnDrift extends DriftPolicy

  private def opCol: Column = {
    // A4: CASE WHEN chain (codegen'd), not a UDF.
    Model.OpByEventType.foldLeft(lit(null).cast("string")) {
      case (acc, (et, op)) => when(col("eventType") === et, lit(op)).otherwise(acc)
    }
  }

  /** Watched-table predicate (A3). Parity semantics: an empty watch map
    * watches nothing (source.dbTables, config.go:111). */
  def watchedFilter(watched: Map[String, Seq[String]]): Column =
    watched.foldLeft(lit(false)) { case (acc, (db, tables)) =>
      acc || (col("database") === db && col("table").isin(tables: _*))
    }

  /** Full decode: raw events (Model.RawEventSchema) → envelope rows with
    * columns (itemID?, log struct, data struct). Works identically on
    * batch and streaming DataFrames (no global state).
    *
    * @param assignItemId when true, adds the reference's gap-free
    *   monotonic itemID (pools.go:57-74) via a global-ordered window —
    *   single-partition, parity/testing only. Default off: the composite
    *   (binlogFile, binlogPosition, rowIdx) is the distributed identity.
    */
  def decode(raw: DataFrame, watched: Map[String, Seq[String]],
      itemByRow: Boolean = true, drift: DriftPolicy = FailOnDrift,
      assignItemId: Boolean = false): DataFrame = {

    val rowsEvents = raw
      .filter(col("eventType").isin(Model.OpByEventType.keys.toSeq: _*)) // A2
      .filter(watchedFilter(watched)) // A3
      .withColumn("operation", opCol) // A4

    // A6: UPDATE events interleave (before, after); keep odd indices.
    val afterImages = rowsEvents
      .select(col("eventType"), col("binlogFile"), col("binlogPosition"),
        col("database"), col("table"), col("operation"), col("colNames"),
        posexplode(col("rows")).as(Seq("rowIdx", "vals")))
      .filter(col("operation") =!= "UPDATE" || col("rowIdx") % 2 === 1)

    // Drift check before zipping (blreaderwork.go:255-259).
    val checked = drift match {
      case FailOnDrift => afterImages.withColumn("vals",
        when(size(col("colNames")) === size(col("vals")), col("vals"))
          .otherwise(raise_error(concat(
            lit("schema drift: expected "), size(col("colNames")).cast("string"),
            lit(" columns, got "), size(col("vals")).cast("string"),
            lit(" at "), col("binlogFile"), lit("/"), col("binlogPosition").cast("string")))))
      case DropOnDrift => afterImages.filter(size(col("colNames")) === size(col("vals")))
    }

    // A5 + A7: zip positional values with discovered names into
    // map<colName, value>; one item per row (itemByRow) or one item per
    // event. The per-event branch sorts on struct<rowIdx, vals> (arrays
    // are orderable; maps are not) and zips AFTER the sort.
    val items =
      if (itemByRow) {
        checked.withColumn("rows",
          array(map_from_arrays(col("colNames"), col("vals"))))
      } else {
        checked.groupBy(col("eventType"), col("binlogFile"), col("binlogPosition"),
            col("database"), col("table"), col("operation"))
          .agg(first(col("colNames")).as("colNames"),
            collect_list(struct(col("rowIdx"), col("vals"))).as("rawRows"))
          .withColumn("rows", transform(array_sort(col("rawRows")),
            x => map_from_arrays(col("colNames"), x.getField("vals"))))
          .withColumn("rowIdx", lit(0))
      }

    val envelope = items.select(
      col("binlogFile"), col("binlogPosition"), col("rowIdx"),
      struct(col("eventType"), col("binlogFile"), col("binlogPosition")).as("log"),
      struct(col("database"), col("table"), col("operation"), col("rows")).as("data"))

    if (assignItemId) {
      graft.operators.GlobalOrder.allow("cdc gap-free itemID")
      envelope.withColumn("itemID", row_number().over(
        Window.orderBy(col("binlogFile"), col("binlogPosition"), col("rowIdx"))).cast("long"))
    } else envelope.withColumn("itemID", lit(null).cast("long"))
  }
}
