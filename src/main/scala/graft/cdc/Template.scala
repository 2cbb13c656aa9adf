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
  /** Function application; in pipe position the piped value is appended
    * as the LAST argument (Go/sprig semantics: `.s | trunc 5` ≙
    * `trunc 5 .s`). */
  final case class Call(name: String, args: Seq[Expr]) extends Expr
  final case class Pipe(base: Expr, funcs: Seq[Call]) extends Expr
  final case class StrLit(s: String) extends Expr
  final case class NumLit(n: Long) extends Expr

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

  /** Split on a delimiter outside double-quoted strings (so
    * `.x | replace "|" "-"` pipelines correctly). */
  private def splitOutsideQuotes(s: String, delim: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) { inQ = !inQ; cur.append(c) }
      else if (c == delim && !inQ) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** Tokenize a call stage: bare words, numbers, paths, quoted strings. */
  private def tokenize(s: String): Seq[String] = {
    val TokRe = raw""""((?:[^"\\]|\\.)*)"|(\S+)""".r
    TokRe.findAllMatchIn(s).map(m =>
      if (m.group(1) != null) "\"" + m.group(1) + "\"" else m.group(2)).toSeq
  }

  private def parseArg(t: String): Expr =
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      StrLit(t.substring(1, t.length - 1)
        .replace("\\\"", "\"").replace("\\\\", "\\")
        .replace("\\n", "\n").replace("\\t", "\t"))
    else if (t.matches("-?[0-9]+")) NumLit(t.toLong)
    else if (t.startsWith(".")) Path(splitPath(t))
    else if (t.startsWith("(")) parseStage(t)
    else sys.error(s"unsupported template argument: $t")

  private[cdc] def parseExpr(s: String): Expr = {
    // pipeline: stage ( '|' func [args] )*
    val stages = splitOutsideQuotes(s, '|').map(_.trim)
    val base = parseStage(stages.head)
    if (stages.size > 1)
      Pipe(base, stages.tail.map { st =>
        val toks = tokenize(st)
        Call(toks.head, toks.tail.map(parseArg))
      })
    else base
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
      // prefix call form: "func arg... arg" (Go: all args are expressions)
      val toks = tokenize(s)
      if (toks.size >= 2) Call(toks.head, toks.tail.map(parseArg))
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
    case StrLit(s) => s
    case NumLit(n) => n
    case Call(name, args) => applyFunc(name, args.map(evalExpr(_, root)))
    case Pipe(base, funcs) =>
      // piped value flows in as the LAST argument of each stage (Go).
      funcs.foldLeft(evalExpr(base, root)) { (v, c) =>
        applyFunc(c.name, c.args.map(evalExpr(_, root)) :+ v)
      }
  }

  private def step(v: Any, field: String): Any = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      mm.getOrElse(field, mm.collectFirst {
        case (k, x) if k.equalsIgnoreCase(field) => x
      }.orNull)
    case _ => null
  }

  /** sprig "empty": null, "", 0, false, empty collection. */
  private def isEmpty(v: Any): Boolean = v match {
    case null => true
    case s: String => s.isEmpty
    case n: Number => n.longValue() == 0 && n.doubleValue() == 0.0
    case b: Boolean => !b
    case s: Seq[_] => s.isEmpty
    case m: Map[_, _] => m.isEmpty
    case _ => false
  }

  private def str1(args: Seq[Any])(f: String => Any): Any =
    args.last match { case null => null; case v => f(show(v)) }

  /** The sprig-subset funcmap (reference loads full sprig minus expandenv
    * plus JSON/YAML helpers, tmpl.go:29-51; this covers the functions a
    * route template plausibly uses — string ops, encoding, default). In
    * pipe position the piped value arrives as the last element of `args`. */
  private def applyFunc(f: String, args: Seq[Any]): Any = f match {
    case "toJson" => toJson(args.last)
    case "upper" => str1(args)(_.toUpperCase)
    case "lower" => str1(args)(_.toLowerCase)
    case "trim" => str1(args)(_.trim)
    case "title" => str1(args)(_.split(' ').map(w =>
      if (w.isEmpty) w else w.substring(0, 1).toUpperCase + w.substring(1)).mkString(" "))
    case "nospace" => str1(args)(_.replaceAll("\\s", ""))
    case "quote" => "\"" + show(args.last) + "\""
    case "squote" => "'" + show(args.last) + "'"
    case "b64enc" => str1(args)(s =>
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8")))
    case "b64dec" => str1(args)(s =>
      new String(java.util.Base64.getDecoder.decode(s), "UTF-8"))
    case "default" => // default d v: d when v is empty
      if (isEmpty(args.last)) args.head else args.last
    case "trunc" => // trunc n s (negative n = last n chars, sprig)
      val n = args.head.asInstanceOf[Number].intValue()
      val s = show(args.last)
      if (n >= 0) s.substring(0, math.min(n, s.length))
      else s.substring(math.max(0, s.length + n))
    case "abbrev" => // abbrev maxlen s: ellipsis beyond maxlen
      val n = args.head.asInstanceOf[Number].intValue()
      val s = show(args.last)
      if (s.length <= n || n < 4) s else s.substring(0, n - 3) + "..."
    case "replace" => // replace old new s
      show(args(2)).replace(show(args(0)), show(args(1)))
    case "repeat" => // repeat count s
      show(args.last) * args.head.asInstanceOf[Number].intValue()
    case "add" => args.map { case n: Number => n.longValue(); case _ => 0L }.sum
    case "len" => args.last match {
      case s: String => s.length.toLong
      case s: Seq[_] => s.size.toLong
      case m: Map[_, _] => m.size.toLong
      case null => 0L
      case other => show(other).length.toLong
    }
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
