package graft.cdc

import graft.SparkTestBase

/** Route-matching semantics (blsenderwork.go:182-184) including the
  * empty-dbTable compat quirk (SURVEY.md §2.A tail note). */
class RoutingSpec extends SparkTestBase {

  private def envelope = {
    val s = spark
    import s.implicits._
    Seq(
      RowEvent(1, BinlogMeta("WriteRowsEventV2", "f1", 10),
        RowChange("testdb", "users", "INSERT", Seq(Map("id" -> "1")))),
      RowEvent(2, BinlogMeta("UpdateRowsEventV2", "f1", 20),
        RowChange("testdb", "users", "UPDATE", Seq(Map("id" -> "1")))),
      RowEvent(3, BinlogMeta("DeleteRowsEventV2", "f1", 30),
        RowChange("testdb", "users", "DELETE", Seq(Map("id" -> "1")))),
      RowEvent(4, BinlogMeta("WriteRowsEventV2", "f1", 40),
        RowChange("testdb", "orders", "INSERT", Seq(Map("id" -> "9"))))
    ).toDF().withColumn("rowIdx", org.apache.spark.sql.functions.lit(0))
  }

  private val tmpl = """{"op":"{{ .Data.Operation }}","t":"{{ .Data.Table }}"}"""

  test("op + db.table match") {
    val r = Route("users-upserts", "c1", Seq("INSERT", "UPDATE"), "testdb.users", tmpl)
    val out = Routing.outbound(envelope, r).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("payload")).toSet ==
      Set("""{"op":"INSERT","t":"users"}""", """{"op":"UPDATE","t":"users"}"""))
  }

  test("empty dbTable: default matches all, strictCompat matches nothing") {
    val r = Route("all", "c1", Seq("INSERT", "UPDATE", "DELETE"), "", tmpl)
    assert(Routing.outbound(envelope, r).count() == 4)
    // Reference behavior: `db.table == ""` is never true (README example
    // config ships exactly this foot-gun, docs/binwatch.v1alpha2.yaml:67).
    assert(Routing.outbound(envelope, r, strictCompat = true).count() == 0)
  }

  test("multi-route fan-out: one event can match N routes") {
    val routes = Seq(
      Route("users-all", "c1", Seq("INSERT", "UPDATE", "DELETE"), "testdb.users", tmpl),
      Route("inserts-anywhere", "c2", Seq("INSERT"), "*", tmpl))
    val out = Routing.outboundAll(envelope, routes).collect()
    // users-all: 3 user events; inserts-anywhere: 2 INSERTs (users+orders)
    assert(out.length == 5)
    assert(out.count(_.getAs[String]("connector") == "c2") == 2)
  }
}
