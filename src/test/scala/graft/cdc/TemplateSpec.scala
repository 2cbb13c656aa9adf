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

  test("sprig math / logic / collection functions (tmpl.go funcmap breadth)") {
    assert(render("""{{ add 2 3 }}""") == "5")
    assert(render("""{{ sub 7 3 }}""") == "4")
    assert(render("""{{ mul 6 7 }}""") == "42")
    assert(render("""{{ div 7 2 }}""") == "3") // sprig int64 division
    assert(render("""{{ mod 7 2 }}""") == "1")
    assert(render("""{{ coalesce .Data.Missing "" .Data.Table }}""") == "users")
    assert(render("""{{ len .Data.Rows | ternary "some" "none" }}""") == "none")
    assert(render("""{{ join "-" (index .Data.Rows 0) }}""") != "") // map renders via show
    assert(render("""{{ splitList "," "a,b,c" | len }}""") == "3")
    assert(render("""{{ splitList "," "a,b,c" | first }}""") == "a")
    assert(render("""{{ splitList "," "a,b,c" | last }}""") == "c")
    // sprig split returns a dict keyed _0.._n
    assert(render("""{{ get (split "," "x,y") "_1" }}""") == "y")
    assert(render("""{{ get (dict "a" 1 "b" 2) "b" }}""") == "2")
    assert(render("""{{ hasKey (dict "a" 1) "a" }}""") == "true")
    assert(render("""{{ keys (dict "b" 1 "a" 2) | join "," }}""") == "a,b")
  }

  test("pipe inside a parenthesized sub-expression stays in its stage") {
    assert(render("""{{ len (.Data.Table | upper) }}""") == "5")
    assert(render("""{{ (.Data.Operation | lower) | trunc 3 }}""") == "ins")
    assert(render("""{{ get (split "," ("a,b" | upper)) "_1" }}""") == "B")
  }

  test("fromJson / fromJsonArray round-trip with toJson") {
    assert(render("""{{ get (fromJson "{\"k\":\"v\",\"n\":3}") "k" }}""") == "v")
    assert(render("""{{ get (fromJson "{\"k\":\"v\",\"n\":3}") "n" }}""") == "3")
    assert(render("""{{ fromJsonArray "[1,2,3]" | len }}""") == "3")
    assert(render("""{{ fromJson "{\"b\":2,\"a\":1}" | toJson }}""")
      == """{"a":1,"b":2}""")
    // parse errors are swallowed (sprig tolerates template-time errors)
    assert(render("""{{ fromJsonArray "not json" | len }}""") == "0")
  }

  test("now / date with Go reference layouts (pinned clock)") {
    TemplateEngine.nowForTest = Some(java.time.Instant.parse("2026-08-12T09:30:05Z"))
    try {
      assert(render("""{{ now | date "2006-01-02" }}""") == "2026-08-12")
      assert(render("""{{ now | date "2006-01-02 15:04:05" }}""") == "2026-08-12 09:30:05")
      assert(render("""{{ now | date "Jan 02, 2006" }}""") == "Aug 12, 2026")
      assert(render("""{{ now | unixEpoch }}""") == "1786527005")
      assert(render("""{{ date "15:04" "2026-08-12T09:30:05Z" }}""") == "09:30")
    } finally TemplateEngine.nowForTest = None
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
