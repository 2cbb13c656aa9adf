package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

/** Decode-pipeline semantics (SURVEY.md §5.3): after-image-only UPDATE,
  * itemByRow explode parity, watched-table filter, op mapping, drift
  * policy. */
class DecodeSpec extends SparkTestBase {

  private def raw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Model.RawEventSchema)

  private def ev(et: String, file: String, pos: Long, db: String, tbl: String,
      cols: Seq[String], rows: Seq[Seq[String]]): Row =
    Row(et, file, pos, db, tbl, cols, rows)

  private val watched = Map("testdb" -> Seq("users", "orders"))

  test("UPDATE keeps only after-images (even-index before rows dropped)") {
    val df = raw(Seq(ev("UpdateRowsEventV2", "f1", 100, "testdb", "users",
      Seq("id", "name"),
      Seq(Seq("1", "old1"), Seq("1", "new1"), Seq("2", "old2"), Seq("2", "new2")))))
    val out = Decode.decode(df, watched).collect()
    assert(out.length == 2)
    val names = out.map(_.getAs[Row]("data").getAs[scala.collection.Seq[Map[String, String]]]("rows")
      .head("name")).sorted
    assert(names.toSeq == Seq("new1", "new2"))
    assert(out.forall(_.getAs[Row]("data").getAs[String]("operation") == "UPDATE"))
  }

  test("INSERT/DELETE keep all rows; op decode matches utils.go:74-90") {
    val df = raw(Seq(
      ev("WriteRowsEventV1", "f1", 10, "testdb", "users", Seq("id"), Seq(Seq("1"), Seq("2"))),
      ev("DeleteRowsEvent", "f1", 20, "testdb", "users", Seq("id"), Seq(Seq("3")))))
    val out = Decode.decode(df, watched).collect()
    val ops = out.map(_.getAs[Row]("data").getAs[String]("operation"))
    assert(ops.count(_ == "INSERT") == 2 && ops.count(_ == "DELETE") == 1)
  }

  test("non-rows events and unwatched tables are dropped") {
    val df = raw(Seq(
      ev("RotateEvent", "f1", 4, null, null, null, null),
      ev("GTIDEvent", "f1", 8, null, null, null, null),
      ev("WriteRowsEventV2", "f1", 30, "otherdb", "users", Seq("id"), Seq(Seq("1"))),
      ev("WriteRowsEventV2", "f1", 40, "testdb", "unwatched", Seq("id"), Seq(Seq("1"))),
      ev("WriteRowsEventV2", "f1", 50, "testdb", "orders", Seq("id"), Seq(Seq("1")))))
    val out = Decode.decode(df, watched).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Row]("data").getAs[String]("table") == "orders")
  }

  test("itemByRow=false groups all rows of an event into one item") {
    val df = raw(Seq(ev("WriteRowsEventV2", "f1", 60, "testdb", "users",
      Seq("id"), Seq(Seq("1"), Seq("2"), Seq("3")))))
    val one = Decode.decode(df, watched, itemByRow = false).collect()
    assert(one.length == 1)
    assert(one.head.getAs[Row]("data").getAs[scala.collection.Seq[Map[String, String]]]("rows")
      .map(_("id")).toSeq == Seq("1", "2", "3"))
    val many = Decode.decode(df, watched, itemByRow = true).collect()
    assert(many.length == 3)
  }

  test("schema drift: FailOnDrift raises, DropOnDrift filters") {
    val df = raw(Seq(ev("WriteRowsEventV2", "f1", 70, "testdb", "users",
      Seq("id", "name"), Seq(Seq("1")))))  // 2 cols declared, 1 value
    val ex = intercept[Exception] {
      Decode.decode(df, watched, drift = Decode.FailOnDrift).collect()
    }
    assert(ex.getMessage.contains("schema drift") ||
      Option(ex.getCause).exists(_.getMessage.contains("schema drift")))
    assert(Decode.decode(df, watched, drift = Decode.DropOnDrift).count() == 0)
  }

  test("assignItemId produces the reference's gap-free monotonic sequence") {
    val df = raw(Seq(
      ev("WriteRowsEventV2", "f1", 10, "testdb", "users", Seq("id"), Seq(Seq("1"), Seq("2"))),
      ev("WriteRowsEventV2", "f2", 5, "testdb", "users", Seq("id"), Seq(Seq("3")))))
    val ids = Decode.decode(df, watched, assignItemId = true)
      .select("itemID").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }
}
