package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Template expression parity with the reference's shipped example
  * (/root/reference/README.md:250-257) and the keyTemplate form
  * (docs/binwatch.v1alpha2.yaml:48). */
class TemplateSpec extends SparkTestBase {

  private val event: Any = Map(
    "itemID" -> 7L,
    "log" -> Map("eventType" -> "WriteRowsEventV2",
      "binlogFile" -> "mysql-bin.000001", "binlogPosition" -> 4321L),
    "data" -> Map(
      "database" -> "testdb", "table" -> "users", "operation" -> "INSERT",
      "rows" -> Seq(Map("id" -> "42", "name" -> "ada", "email" -> "a@b.c"))))

  private def render(tmpl: String): String =
    TemplateEngine.render(TemplateEngine.parse(tmpl), event)

  test("field paths incl. Go-style capitalized names") {
    assert(render("{{ .ItemID }}") == "7")
    assert(render("{{ .Data.Operation }}") == "INSERT")
    assert(render("{{ .data.operation }}") == "INSERT")
    assert(render("{{ .Log.BinlogFile }}/{{ .Log.BinlogPosition }}")
      == "mysql-bin.000001/4321")
  }

  test("reference example template renders valid routed payload") {
    // Shipped example template, README.md:250-257.
    val tmpl =
      """{
        |  "index": "testdb-users-v1",
        |  "itemID":"{{ .ItemID }}",
        |  "operation":"{{ .Data.Operation }}",
        |  "rows": {{- .Data.Rows | toJson }}
        |}""".stripMargin
    val out = render(tmpl)
    assert(out.contains(""""itemID":"7""""))
    assert(out.contains(""""operation":"INSERT""""))
    // Go json.Marshal sorts object keys; `{{-` eats preceding whitespace.
    assert(out.contains(""""rows":[{"email":"a@b.c","id":"42","name":"ada"}]"""))
    // Payload must itself be valid JSON for the webhook sink.
    assert(out.trim.startsWith("{") && out.trim.endsWith("}"))
  }

  test("index + field access (keyTemplate form)") {
    assert(render("{{ (index .Data.Rows 0).id }}") == "42")
    assert(render("{{ (index .Data.Rows 5).id }}") == "<no value>")
  }

  test("pipes and prefix call form") {
    assert(render("{{ .Data.Table | upper }}") == "USERS")
    assert(render("{{ upper .Data.Table }}") == "USERS")
    assert(render("{{ toJson .Data.Rows }}")
      == """[{"email":"a@b.c","id":"42","name":"ada"}]""")
  }

  test("trim markers match Go semantics") {
    assert(render("a   {{- .Data.Operation }}") == "aINSERT")
    assert(render("{{ .Data.Operation -}}   b") == "INSERTb")
  }

  test("sprig-subset functions with pipe arguments (piped value last)") {
    assert(render("""{{ .Data.Table | title }}""") == "Users")
    assert(render("""{{ .Data.Missing | default "none" }}""") == "none")
    assert(render("""{{ .Data.Table | default "none" }}""") == "users")
    assert(render("""{{ .Data.Table | trunc 3 }}""") == "use")
    assert(render("""{{ .Data.Table | trunc -3 }}""") == "ers")
    assert(render("""{{ .Data.Table | replace "s" "z" }}""") == "uzerz")
    assert(render("""{{ .Data.Table | b64enc }}""") == "dXNlcnM=")
    assert(render("""{{ .Data.Table | b64enc | b64dec }}""") == "users")
    assert(render("""{{ .Data.Table | quote }}""") == "\"users\"")
    assert(render("""{{ .Data.Rows | len }}""") == "1")
    assert(render("""{{ .Data.Operation | lower | repeat 2 }}""") == "insertinsert")
    // quoted pipe character must not split the pipeline
    assert(render("""{{ .Data.Table | replace "s" "|" }}""") == "u|er|")
    // prefix form with literal args
    assert(render("""{{ default "none" .Data.Missing }}""") == "none")
    assert(render("""{{ abbrev 5 .Data.Database }}""") == "te...")
  }

  test("renders as a Catalyst expression over a real DataFrame") {
    val s = spark
    import s.implicits._
    val df = Seq(
      RowEvent(1L, BinlogMeta("WriteRowsEventV2", "mysql-bin.000001", 100L),
        RowChange("testdb", "users", "INSERT", Seq(Map("id" -> "1", "name" -> "n1")))),
      RowEvent(2L, BinlogMeta("DeleteRowsEventV2", "mysql-bin.000001", 200L),
        RowChange("testdb", "users", "DELETE", Seq(Map("id" -> "2", "name" -> "n2"))))
    ).toDF()
    val out = df.select(Template.render(
      """{"op":"{{ .data.operation }}","rows":{{ .data.rows | toJson }}}""",
      struct(col("itemID"), col("log"), col("data"))).as("payload"))
      .collect().map(_.getString(0))
    assert(out(0) == """{"op":"INSERT","rows":[{"id":"1","name":"n1"}]}""")
    assert(out(1) == """{"op":"DELETE","rows":[{"id":"2","name":"n2"}]}""")
  }
}
