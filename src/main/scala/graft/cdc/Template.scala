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
  *   - pipes:             {{ .Data.Rows | toJson }}, incl. from literals
  *     and inside parens: {{ (.x | lower).y }}
  *   - prefix call form:  {{ toJson .Data.Rows }}; zero-arg {{ now }}
  *   - indexing + field:  {{ (index .Data.Rows 0).id }}; field access on
  *     any parenthesized sub-expression
  *   - trim markers:      {{- expr -}} (Go semantics: eat adjacent
  *     whitespace in the surrounding literal text)
  *   - funcmap breadth (sprig subset + tmpl.go extras): string ops
  *     (upper/lower/trim/title/nospace/quote/squote/trunc/abbrev/
  *     replace/repeat), encoding (b64enc/b64dec), logic (default/
  *     coalesce/ternary), integer math (add/sub/mul/div/mod), lists
  *     (join/splitList/first/last/len), dicts (dict/get/hasKey/keys/
  *     split), JSON (toJson/fromJson/fromJsonArray), time (now/date
  *     with Go reference layouts/unixEpoch)
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
  /** Field selection on an arbitrary sub-expression: `(expr).a.b`. */
  final case class Sel(base: Expr, fields: Seq[String]) extends Expr
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

  /** Split on a delimiter outside double-quoted strings AND outside
    * parentheses (so `.x | replace "|" "-"` pipelines correctly and a
    * pipe inside a parenthesized sub-expression like
    * `{{ (.x | lower).y }}` stays in its own stage). */
  private def splitOutsideQuotes(s: String, delim: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) { inQ = !inQ; cur.append(c) }
      else if (inQ) cur.append(c)
      else if (c == '(') { depth += 1; cur.append(c) }
      else if (c == ')') { depth -= 1; cur.append(c) }
      else if (c == delim && depth == 0) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** Tokenize a call stage: bare words, numbers, paths, quoted strings,
    * and parenthesized sub-expressions (kept whole across nesting, so
    * `get (dict "a" 1) "a"` yields 3 tokens). */
  private def tokenize(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) { inQ = !inQ; cur.append(c) }
      else if (inQ) cur.append(c)
      else if (c == '(') { depth += 1; cur.append(c) }
      else if (c == ')') { depth -= 1; cur.append(c) }
      else if (c.isWhitespace && depth == 0) flush()
      else cur.append(c)
      i += 1
    }
    flush()
    out.result()
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
      // (expr).rest — inner may be any expression, incl. a pipeline
      val close = s.lastIndexOf(')')
      val inner = parseExpr(s.substring(1, close).trim)
      val rest = s.substring(close + 1).split('.').map(_.trim).filter(_.nonEmpty).toSeq
      inner match {
        case IndexOf(b, i, Nil) => IndexOf(b, i, rest)
        case other => if (rest.isEmpty) other else Sel(other, rest)
      }
    } else if (s.startsWith("index ")) {
      val parts = s.stripPrefix("index ").trim.split("\\s+")
      IndexOf(Path(splitPath(parts(0))), parts(1).toInt, Nil)
    } else if (s.startsWith(".")) {
      Path(splitPath(s))
    } else if (s.startsWith("\"") || s.matches("-?[0-9]+")) {
      // literal stage (a pipeline may start from a constant: `"a,b" | upper`)
      parseArg(s)
    } else {
      // prefix call form: "func [arg...]" (Go: all args are expressions;
      // zero-arg calls like `now` are a bare identifier)
      val toks = tokenize(s)
      if (toks.size >= 2) Call(toks.head, toks.tail.map(parseArg))
      else if (toks.size == 1 && toks.head.matches("[A-Za-z][A-Za-z0-9_]*"))
        Call(toks.head, Nil)
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
      val ks = m.keyArray().toObjectArray(kt).map(fromCatalyst(_, kt))
      val vs = m.valueArray().toObjectArray(vt).map(fromCatalyst(_, vt))
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
    case Sel(base, fields) => fields.foldLeft(evalExpr(base, root))(step)
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
    case "add" => args.map(asLong).sum
    case "sub" => asLong(args(0)) - asLong(args(1)) // sprig: sub a b = a - b
    case "mul" => args.map(asLong).product
    case "div" => asLong(args(0)) / asLong(args(1)) // integer division (sprig int64)
    case "mod" => asLong(args(0)) % asLong(args(1))
    case "coalesce" => args.find(!isEmpty(_)).orNull
    case "ternary" => // ternary ifTrue ifFalse cond (cond pipes in last)
      if (args(2) == true || args(2) == "true") args(0) else args(1)
    case "join" => // join sep list
      args.last match {
        case s: Seq[_] => s.map(show).mkString(show(args.head))
        case null => ""
        case v => show(v)
      }
    case "splitList" => // splitList sep s -> list
      show(args.last).split(java.util.regex.Pattern.quote(show(args.head)), -1).toSeq
    case "split" => // split sep s -> dict {_0: ..., _1: ...} (sprig)
      show(args.last).split(java.util.regex.Pattern.quote(show(args.head)), -1)
        .zipWithIndex.map { case (p, i) => s"_$i" -> (p: Any) }.toMap
    case "dict" => // dict k1 v1 k2 v2 ... (odd trailing key -> "")
      args.grouped(2).collect {
        case Seq(k, v) => show(k) -> v
        case Seq(k) => show(k) -> ("": Any)
      }.toMap
    case "get" => // get dict key ("" when absent, sprig)
      args.head match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].getOrElse(show(args.last), "")
        case _ => ""
      }
    case "hasKey" => args.head match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains(show(args.last))
      case _ => false
    }
    case "keys" => args.last match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].keys.toSeq.sorted
      case _ => Seq.empty[Any]
    }
    case "first" => args.last match {
      case s: Seq[_] if s.nonEmpty => s.head
      case _ => null
    }
    case "last" => args.last match {
      case s: Seq[_] if s.nonEmpty => s.last
      case _ => null
    }
    case "fromJson" => parseJson(show(args.last)) match {
      case m: Map[_, _] => m
      case _ => Map("Error" -> "not a JSON object")
    }
    case "fromJsonArray" => parseJson(show(args.last)) match {
      case s: Seq[_] => s
      case _ => Seq.empty[Any]
    }
    case "now" => nowForTest.getOrElse(java.time.Instant.now())
    case "date" => // date GO_LAYOUT t (t pipes in last); UTC rendering
      val inst = args.last match {
        case i: java.time.Instant => i
        case n: Number => java.time.Instant.ofEpochSecond(n.longValue())
        case s: String => java.time.Instant.parse(s)
        case _ => java.time.Instant.EPOCH
      }
      java.time.format.DateTimeFormatter
        .ofPattern(goLayoutToJava(show(args.head)))
        .withZone(java.time.ZoneOffset.UTC)
        .format(inst)
    case "unixEpoch" => args.last match {
      case i: java.time.Instant => i.getEpochSecond
      case _ => 0L
    }
    case "len" => args.last match {
      case s: String => s.length.toLong
      case s: Seq[_] => s.size.toLong
      case m: Map[_, _] => m.size.toLong
      case null => 0L
      case other => show(other).length.toLong
    }
    case other => sys.error(s"unsupported template function: $other")
  }

  private def asLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case s: String => try s.trim.toLong catch { case _: Throwable => 0L }
    case _ => 0L
  }

  /** Test seam: pin `now` for golden tests. */
  private[cdc] var nowForTest: Option[java.time.Instant] = None

  /** Go reference-time layout → java DateTimeFormatter pattern, for the
    * layout tokens route templates plausibly use (Go's magic reference
    * date is Mon Jan 2 15:04:05 2006 MST). Longest-match replacement. */
  private[cdc] def goLayoutToJava(layout: String): String = {
    val subs = Seq(
      "2006" -> "yyyy", "06" -> "yy",
      "January" -> "MMMM", "Jan" -> "MMM", "01" -> "MM",
      "Monday" -> "EEEE", "Mon" -> "EEE", "02" -> "dd", "_2" -> "d",
      "15" -> "HH", "03" -> "hh", "04" -> "mm", "05" -> "ss",
      ".000" -> ".SSS", "PM" -> "a", "-07:00" -> "XXX", "-0700" -> "xx",
      "Z07:00" -> "XXX", "MST" -> "zzz")
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      subs.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, j)) => sb.append(j); i += go.length
        case None =>
          val c = layout.charAt(i)
          // quote literal letters so DateTimeFormatter doesn't eat them
          if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }

  // ---------- JSON parse (for fromJson/fromJsonArray) ----------
  /** Minimal recursive-descent JSON parser over our template value domain
    * (Map[String,Any] / Seq[Any] / String / Long / Double / Boolean /
    * null). Errors yield null (sprig swallows template-time errors). */
  def parseJson(s: String): Any =
    try { val p = new JsonParser(s); val v = p.value(); p.skipWs(); v }
    catch { case _: Throwable => null }

  private final class JsonParser(s: String) {
    private var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) sys.error(s"expected $c at $i")
      i += 1
    }
    def value(): Any = {
      skipWs()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => number()
      }
    }
    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) sys.error(s"bad literal at $i")
      i += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Any]
      if (s.charAt(i) == '}') { i += 1; return b.result() }
      while (true) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (s.charAt(i) == ',') i += 1
        else { expect('}'); return b.result() }
      }
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('['); skipWs()
      val b = Seq.newBuilder[Any]
      if (s.charAt(i) == ']') { i += 1; return b.result() }
      while (true) {
        b += value()
        skipWs()
        if (s.charAt(i) == ',') i += 1
        else { expect(']'); return b.result() }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case '/' => sb.append('/')
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => sb.append(other)
          }
        } else sb.append(s.charAt(i))
        i += 1
      }
      i += 1
      sb.toString
    }
    private def number(): Any = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble else t.toLong
    }
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
