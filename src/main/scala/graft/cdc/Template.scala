package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Payload templating (A11) as a native Catalyst Expression.
  *
  * Implements the subset of the Go text/template surface the reference's
  * route templates actually use (shipped example:
  * /root/reference/README.md:250-257, engine at internal/tmpl/tmpl.go):
  *
  *   - field paths:       {{ .ItemID }}, {{ .Data.Operation }}, ...
  *     (paths are matched case-insensitively so both the reference's Go
  *     field names (.Data.Rows) and our envelope names (.data.rows) work)
  *   - pipes:             {{ .Data.Rows | toJson }}  (also upper/lower/trim)
  *   - prefix call form:  {{ toJson .Data.Rows }}
  *   - indexing + field:  {{ (index .Data.Rows 0).id }}
  *   - trim markers:      {{- expr -}} (Go semantics: eat adjacent
  *     whitespace in the surrounding literal text)
  *
  * `toJson` matches Go's json.Marshal observable behavior for our value
  * domain: object keys sorted, compact output (tmpl.go:131-139).
  *
  * The template is parsed once at construction (mirroring the reference's
  * startup-time template compile, blsenderwork.go:102); evaluation is a
  * linear walk over precompiled nodes. CodegenFallback: templating is
  * string concat — not a codegen win — and this keeps the expression
  * usable inside whole-stage-codegen'd plans without breaking them.
  */
case class RenderTemplate(child: Expression, template: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "render_template"

  @transient private lazy val nodes: Seq[TemplateEngine.Node] =
    TemplateEngine.parse(template)

  @transient private lazy val structType: StructType =
    child.dataType.asInstanceOf[StructType]

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.fromString("")
    else {
      val tree = TemplateEngine.fromCatalyst(v, structType)
      UTF8String.fromString(TemplateEngine.render(nodes, tree))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RenderTemplate =
    copy(child = newChild)
}

object Template {
  /** Column API: render `template` over a struct column. */
  def render(template: String, event: Column): Column =
    Bridge.column(RenderTemplate(Bridge.expression(event), template))
}

/** Mini template engine: parse / eval / JSON. Pure Scala, no Spark deps
  * beyond the Catalyst value converters, so it is also unit-testable
  * without a session. */
object TemplateEngine {

  // ---------- AST ----------
  sealed trait Node
  final case class Lit(s: String) extends Node
  final case class Action(expr: Expr, trimL: Boolean, trimR: Boolean) extends Node

  sealed trait Expr
  final case class Path(segs: Seq[String]) extends Expr
  final case class IndexOf(base: Expr, idx: Int, rest: Seq[String]) extends Expr
  final case class Pipe(base: Expr, funcs: Seq[String]) extends Expr

  // ---------- parse ----------
  private val ActionRe = raw"\{\{(-?)\s*(.*?)\s*(-?)\}\}".r

  def parse(template: String): Seq[Node] = {
    val out = Seq.newBuilder[Node]
    var last = 0
    for (m <- ActionRe.findAllMatchIn(template)) {
      if (m.start > last) out += Lit(template.substring(last, m.start))
      out += Action(parseExpr(m.group(2)), m.group(1) == "-", m.group(3) == "-")
      last = m.end
    }
    if (last < template.length) out += Lit(template.substring(last))
    applyTrim(out.result())
  }

  private def applyTrim(nodes: Seq[Node]): Seq[Node] =
    nodes.zipWithIndex.map {
      case (Lit(s), i) =>
        var r = s
        nodes.lift(i - 1) match {
          case Some(Action(_, _, true)) => r = r.replaceAll("^\\s+", "")
          case _ =>
        }
        nodes.lift(i + 1) match {
          case Some(Action(_, true, _)) => r = r.replaceAll("\\s+$", "")
          case _ =>
        }
        Lit(r)
      case (n, _) => n
    }

  private[cdc] def parseExpr(s: String): Expr = {
    // pipeline: stage ( '|' func )*
    val stages = s.split('|').map(_.trim).toSeq
    val base = parseStage(stages.head)
    if (stages.size > 1) Pipe(base, stages.tail) else base
  }

  private def parseStage(s: String): Expr = {
    if (s.startsWith("(")) {
      // (index .Path N).rest
      val close = s.lastIndexOf(')')
      val inner = parseStage(s.substring(1, close).trim)
      val rest = s.substring(close + 1).split('.').map(_.trim).filter(_.nonEmpty).toSeq
      inner match {
        case IndexOf(b, i, Nil) => IndexOf(b, i, rest)
        case other => if (rest.isEmpty) other
          else sys.error(s"field access on non-index expression: $s")
      }
    } else if (s.startsWith("index ")) {
      val parts = s.stripPrefix("index ").trim.split("\\s+")
      IndexOf(Path(splitPath(parts(0))), parts(1).toInt, Nil)
    } else if (s.startsWith(".")) {
      Path(splitPath(s))
    } else {
      // prefix call form: "func .path"
      val parts = s.split("\\s+", 2)
      if (parts.length == 2) Pipe(parseStage(parts(1).trim), Seq(parts(0)))
      else sys.error(s"unsupported template expression: $s")
    }
  }

  private def splitPath(s: String): Seq[String] =
    s.split('.').map(_.trim).filter(_.nonEmpty).toSeq

  // ---------- Catalyst → Scala tree ----------
  def fromCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: InternalRow, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        f.name -> fromCatalyst(r.get(i, f.dataType), f.dataType)
      }.toMap
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).toSeq.map(fromCatalyst(_, et))
    case (m: MapData, MapType(kt, vt, _)) =>
      val ks = m.keyArray.toObjectArray(kt).map(fromCatalyst(_, kt))
      val vs = m.valueArray.toObjectArray(vt).map(fromCatalyst(_, vt))
      ks.zip(vs).toMap
    case (s: UTF8String, _) => s.toString
    case (other, _) => other
  }

  // ---------- eval ----------
  def render(nodes: Seq[Node], root: Any): String = {
    val sb = new StringBuilder
    nodes.foreach {
      case Lit(s) => sb.append(s)
      case Action(e, _, _) => sb.append(show(evalExpr(e, root)))
    }
    sb.toString
  }

  private def evalExpr(e: Expr, root: Any): Any = e match {
    case Path(segs) => segs.foldLeft(root)(step)
    case IndexOf(base, i, rest) =>
      evalExpr(base, root) match {
        case s: Seq[_] if i >= 0 && i < s.size => rest.foldLeft(s(i): Any)(step)
        case _ => null
      }
    case Pipe(base, funcs) => funcs.foldLeft(evalExpr(base, root))(applyFunc)
  }

  private def step(v: Any, field: String): Any = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      mm.getOrElse(field, mm.collectFirst {
        case (k, x) if k.equalsIgnoreCase(field) => x
      }.orNull)
    case _ => null
  }

  private def applyFunc(v: Any, f: String): Any = f match {
    case "toJson" => toJson(v)
    case "upper" => Option(v).map(x => show(x).toUpperCase).orNull
    case "lower" => Option(v).map(x => show(x).toLowerCase).orNull
    case "trim" => Option(v).map(x => show(x).trim).orNull
    case other => sys.error(s"unsupported template function: $other")
  }

  private def show(v: Any): String = v match {
    case null => "<no value>" // Go text/template renders missing as "<no value>"
    case s: String => s
    case m: Map[_, _] => toJson(m)
    case s: Seq[_] => toJson(s)
    case other => other.toString
  }

  // ---------- JSON (Go json.Marshal-compatible for our value domain) ----------
  def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${quote(k)}:${toJson(x)}" }
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(toJson).mkString("[", ",", "]")
    case b: Boolean => b.toString
    case n: Number => n.toString
    case other => quote(other.toString)
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }
}
