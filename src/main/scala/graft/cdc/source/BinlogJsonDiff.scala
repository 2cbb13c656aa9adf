package graft.cdc.source

import java.nio.charset.StandardCharsets

/** Applier for MySQL partial-JSON updates
  * (`binlog_row_value_options=PARTIAL_JSON`, public format per WL#2955 /
  * rows_event.h): a PARTIAL_UPDATE_ROWS_EVENT after-image stores a JSON
  * column as a sequence of diffs — (operation, JSON path, binary-JSON
  * value) triples — instead of the full document. The reference consumes
  * these through go-mysql (blreaderwork.go:264-269 passes the decoded
  * column through); this applies the diffs to the BEFORE image's full
  * document so the pipeline keeps emitting complete after-images.
  *
  * The document is edited as TEXT structure: containers are parsed,
  * scalars are kept as verbatim literal slices, and the new values come
  * from [[BinlogJson.decode]] — so an untouched subtree round-trips
  * byte-identically (no number/escape re-canonicalization) and edited
  * documents render exactly like fully-logged ones.
  */
object BinlogJsonDiff {

  // diff operations (rows_event.h enum_json_diff_operation order)
  val OP_REPLACE = 0
  val OP_INSERT = 1
  val OP_REMOVE = 2

  private sealed trait Node
  private final case class Raw(text: String) extends Node
  private final case class Obj(
      fields: scala.collection.mutable.LinkedHashMap[String, Node]) extends Node
  private final case class Arr(
      items: scala.collection.mutable.ArrayBuffer[Node]) extends Node

  private sealed trait Step
  private final case class Member(name: String) extends Step
  private final case class Index(i: Int) extends Step

  /** Apply a binlog diff sequence to a full JSON document.
    *
    * `diffBytes` layout (one diff after another until exhausted):
    * op u8, path length lenenc, path bytes (e.g. `$.a.b[2]`), and for
    * REPLACE/INSERT a value length lenenc + binary JSON value. An EMPTY
    * sequence means "column unchanged". */
  def applyDiffs(beforeJson: String, diffBytes: Array[Byte]): String = {
    if (diffBytes.isEmpty) return beforeJson
    var root: Node = parse(beforeJson)
    var p = 0
    def lenenc(): Long = {
      val first = diffBytes(p) & 0xff; p += 1
      if (first < 0xfb) first.toLong
      else if (first == 0xfc) {
        val v = (diffBytes(p) & 0xffL) | ((diffBytes(p + 1) & 0xffL) << 8); p += 2; v
      } else if (first == 0xfd) {
        val v = (diffBytes(p) & 0xffL) | ((diffBytes(p + 1) & 0xffL) << 8) |
          ((diffBytes(p + 2) & 0xffL) << 16); p += 3; v
      } else if (first == 0xfe) {
        var v = 0L; var i = 0
        while (i < 8) { v |= (diffBytes(p + i) & 0xffL) << (8 * i); i += 1 }
        p += 8; v
      } else throw new IllegalArgumentException(
        s"bad lenenc prefix 0x${first.toHexString} in JSON diff")
    }
    while (p < diffBytes.length) {
      val op = diffBytes(p) & 0xff; p += 1
      require(op == OP_REPLACE || op == OP_INSERT || op == OP_REMOVE,
        s"unknown JSON diff operation $op")
      val pathLen = lenenc().toInt
      val path = new String(diffBytes, p, pathLen, StandardCharsets.UTF_8)
      p += pathLen
      val value: Option[Node] =
        if (op == OP_REMOVE) None
        else {
          val valLen = lenenc().toInt
          val valBytes = java.util.Arrays.copyOfRange(diffBytes, p, p + valLen)
          p += valLen
          Some(parse(BinlogJson.decode(valBytes)))
        }
      root = applyOne(root, op, parsePath(path), value)
    }
    serialize(root)
  }

  // ---- JSON text parser (scalars kept as raw slices) ----

  private def parse(s: String): Node = {
    val st = new Parser(s)
    val v = st.value()
    st.skipWs()
    require(st.p == s.length, s"trailing characters in JSON document at ${st.p}")
    v
  }

  private final class Parser(s: String) {
    var p = 0
    def skipWs(): Unit =
      while (p < s.length && (s(p) == ' ' || s(p) == '\t' || s(p) == '\n' || s(p) == '\r')) p += 1
    def value(): Node = {
      skipWs()
      require(p < s.length, "unexpected end of JSON document")
      s(p) match {
        case '{' =>
          p += 1
          val fields = scala.collection.mutable.LinkedHashMap.empty[String, Node]
          skipWs()
          if (p < s.length && s(p) == '}') { p += 1; Obj(fields) }
          else {
            var done = false
            while (!done) {
              skipWs()
              val key = unquote(rawString())
              skipWs()
              require(p < s.length && s(p) == ':', s"expected ':' at $p")
              p += 1
              fields(key) = value()
              skipWs()
              require(p < s.length && (s(p) == ',' || s(p) == '}'), s"expected ',' or '}' at $p")
              if (s(p) == '}') done = true
              p += 1
            }
            Obj(fields)
          }
        case '[' =>
          p += 1
          val items = scala.collection.mutable.ArrayBuffer.empty[Node]
          skipWs()
          if (p < s.length && s(p) == ']') { p += 1; Arr(items) }
          else {
            var done = false
            while (!done) {
              items += value()
              skipWs()
              require(p < s.length && (s(p) == ',' || s(p) == ']'), s"expected ',' or ']' at $p")
              if (s(p) == ']') done = true
              p += 1
            }
            Arr(items)
          }
        case '"' => Raw(rawString())
        case _ =>
          val start = p
          while (p < s.length && !",]}" .contains(s(p)) &&
            !s(p).isWhitespace) p += 1
          require(p > start, s"empty JSON scalar at $start")
          Raw(s.substring(start, p))
      }
    }
    /** A quoted string INCLUDING its quotes, escape-aware. */
    def rawString(): String = {
      require(p < s.length && s(p) == '"', s"expected string at $p")
      val start = p
      p += 1
      while (p < s.length && s(p) != '"') {
        if (s(p) == '\\') p += 1
        p += 1
      }
      require(p < s.length, "unterminated JSON string")
      p += 1
      s.substring(start, p)
    }
  }

  /** Unescape a quoted JSON string token to its member-name form. */
  private def unquote(quoted: String): String = {
    val body = quoted.substring(1, quoted.length - 1)
    if (!body.contains('\\')) return body
    val sb = new java.lang.StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val ch = body(i)
      if (ch == '\\') {
        i += 1
        body(i) match {
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case '/' => sb.append('/')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'u' =>
            sb.append(Integer.parseInt(body.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case other => throw new IllegalArgumentException(s"bad escape \\$other")
        }
      } else sb.append(ch)
      i += 1
    }
    sb.toString
  }

  // ---- JSON path (concrete diff locations: $, .member, ."member", [N]) ----

  private def parsePath(path: String): List[Step] = {
    require(path.nonEmpty && path(0) == '$', s"JSON diff path must start with $$: '$path'")
    val steps = List.newBuilder[Step]
    var i = 1
    while (i < path.length) {
      path(i) match {
        case '.' =>
          i += 1
          require(i < path.length, s"dangling '.' in path '$path'")
          if (path(i) == '"') {
            val start = i
            i += 1
            while (i < path.length && path(i) != '"') {
              if (path(i) == '\\') i += 1
              i += 1
            }
            require(i < path.length, s"unterminated quoted member in path '$path'")
            i += 1
            steps += Member(unquote(path.substring(start, i)))
          } else {
            val start = i
            while (i < path.length && path(i) != '.' && path(i) != '[') i += 1
            require(i > start, s"empty member name in path '$path'")
            steps += Member(path.substring(start, i))
          }
        case '[' =>
          val start = i + 1
          i += 1
          while (i < path.length && path(i) != ']') i += 1
          require(i < path.length && i > start, s"bad array index in path '$path'")
          steps += Index(path.substring(start, i).toInt)
          i += 1
        case other =>
          throw new IllegalArgumentException(s"unexpected '$other' in path '$path'")
      }
    }
    steps.result()
  }

  // ---- diff application ----

  private def applyOne(root: Node, op: Int, steps: List[Step],
      value: Option[Node]): Node = {
    if (steps.isEmpty) {
      // root path "$": only REPLACE is meaningful (MySQL never emits
      // insert/remove at the root — there is no parent container)
      require(op == OP_REPLACE, s"JSON diff op $op at root path")
      return value.get
    }
    val parent = steps.init.foldLeft(root) { (node, step) =>
      descend(node, step)
    }
    (parent, steps.last) match {
      case (Obj(fields), Member(name)) => op match {
        case OP_REPLACE =>
          require(fields.contains(name), s"replace at missing member '$name'")
          fields(name) = value.get
        case OP_INSERT =>
          require(!fields.contains(name), s"insert at existing member '$name'")
          fields(name) = value.get
        case OP_REMOVE =>
          require(fields.remove(name).isDefined, s"remove at missing member '$name'")
      }
      case (Arr(items), Index(i)) => op match {
        case OP_REPLACE =>
          require(i >= 0 && i < items.length, s"replace at out-of-range index $i")
          items(i) = value.get
        case OP_INSERT =>
          require(i >= 0 && i <= items.length, s"insert at out-of-range index $i")
          items.insert(i, value.get)
        case OP_REMOVE =>
          require(i >= 0 && i < items.length, s"remove at out-of-range index $i")
          items.remove(i)
      }
      case (other, step) =>
        throw new IllegalArgumentException(
          s"JSON diff step $step does not apply to ${kind(other)}")
    }
    root
  }

  private def descend(node: Node, step: Step): Node = (node, step) match {
    case (Obj(fields), Member(name)) =>
      fields.getOrElse(name,
        throw new IllegalArgumentException(s"path member '$name' not found"))
    case (Arr(items), Index(i)) =>
      require(i >= 0 && i < items.length, s"path index $i out of range")
      items(i)
    case (other, s) =>
      throw new IllegalArgumentException(s"path step $s does not apply to ${kind(other)}")
  }

  private def kind(n: Node): String = n match {
    case _: Obj => "an object"
    case _: Arr => "an array"
    case Raw(t) => s"scalar $t"
  }

  // ---- serialization (compact, BinlogJson-identical) ----

  private def serialize(n: Node): String = {
    val sb = new java.lang.StringBuilder
    write(n, sb)
    sb.toString
  }

  private def write(n: Node, sb: java.lang.StringBuilder): Unit = n match {
    case Raw(text) => sb.append(text)
    case Obj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, v) =>
        if (!first) sb.append(',')
        first = false
        sb.append(BinlogJson.escape(k))
        sb.append(':')
        write(v, sb)
      }
      sb.append('}')
    case Arr(items) =>
      sb.append('[')
      var i = 0
      while (i < items.length) {
        if (i > 0) sb.append(',')
        write(items(i), sb)
        i += 1
      }
      sb.append(']')
  }
}
