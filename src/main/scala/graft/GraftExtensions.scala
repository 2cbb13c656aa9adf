package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Fnv1aHash, Fnv1aHashLongLE, NGrams}
import graft.functions.VectorOps.{VectorDot, VectorNormL2}
import graft.cdc.RenderTemplate

/** SQL surface for the engine's custom expressions, registered through
  * the standard `SparkSessionExtensions` mechanism:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * or on an already-running session (notebooks, shared sessions):
  *
  * {{{ GraftExtensions.register(spark) }}}
  *
  * After which plain SQL can use:
  *  - `fnv1a64(str)`               — reference-parity shard hash (A9)
  *  - `fnv1a64_long_le(n)`         — FNV over 8 LE bytes (position-key form)
  *  - `vector_dot(a, b)`           — codegen dot product (B30)
  *  - `vector_norm_l2(a)`          — codegen L2 norm (B30)
  *  - `ngrams(tokens, n)`          — n-gram generator UDTF (B31)
  *  - `str_poly_hash(str)`         — dedup identity hash (codegen)
  *  - `token_span_hashes(toks, w)` — dedup shingle/span kernel (codegen)
  *  - `zvalue(x, y, bits)`         — Morton/z-order layout kernel (codegen)
  *  - `render_template(ev, tmpl)`  — route payload templating (A11);
  *    tmpl must be a string literal (compiled once per plan, same as the
  *    reference compiling templates at startup, blsenderwork.go:102)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def one(name: String)(f: Expression => Expression): FunctionBuilder =
    args => {
      require(args.size == 1, s"$name expects 1 argument, got ${args.size}")
      f(args.head)
    }

  private def two(name: String)(f: (Expression, Expression) => Expression): FunctionBuilder =
    args => {
      require(args.size == 2, s"$name expects 2 arguments, got ${args.size}")
      f(args(0), args(1))
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "fnv1a64(str) - FNV-1a 64-bit hash of str's UTF-8 bytes"),
      one("fnv1a64")(Fnv1aHash(_))),

    (FunctionIdentifier("fnv1a64_long_le"),
      info("fnv1a64_long_le",
        "fnv1a64_long_le(n) - FNV-1a 64-bit hash of n's 8 little-endian bytes (reference position-key form)"),
      one("fnv1a64_long_le")(Fnv1aHashLongLE(_))),

    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of float/double arrays"),
      two("vector_dot")(VectorDot(_, _))),

    (FunctionIdentifier("vector_norm_l2"),
      info("vector_norm_l2", "vector_norm_l2(a) - L2 norm of a float/double array"),
      one("vector_norm_l2")(VectorNormL2(_))),

    (FunctionIdentifier("ngrams"),
      info("ngrams", "ngrams(tokens, n) - explode a token array into word n-grams"),
      two("ngrams") { (tokens, n) =>
        val nv = n match {
          case Literal(v: Int, _) => v
          case other => sys.error(s"ngrams(tokens, n): n must be an int literal, got $other")
        }
        NGrams(tokens, nv)
      }),

    (FunctionIdentifier("str_poly_hash"),
      info("str_poly_hash",
        "str_poly_hash(str) - polynomial byte hash fold((h*31 + b) mod 1e9+7) (dedup identity hash; ASCII contract)"),
      one("str_poly_hash")(graft.functions.StrPolyHash(_))),

    (FunctionIdentifier("token_span_hashes"),
      info("token_span_hashes",
        "token_span_hashes(tokens, w) - distinct rolling w-token span hashes (dedup shingle/span kernel)"),
      two("token_span_hashes") { (tokens, w) =>
        val wv = w match {
          case Literal(v: Int, _) => v
          case other => sys.error(
            s"token_span_hashes(tokens, w): w must be an int literal, got $other")
        }
        graft.functions.TokenSpanHashes(tokens, wv)
      }),

    (FunctionIdentifier("zvalue"),
      info("zvalue",
        "zvalue(x, y, bits) - Morton/z-order interleave of the low `bits` bits of two longs (layout clustering kernel)"),
      args => {
        require(args.size == 3, s"zvalue expects 3 arguments, got ${args.size}")
        val bits = args(2) match {
          case Literal(v: Int, _) => v
          case other => sys.error(
            s"zvalue(x, y, bits): bits must be an int literal, got $other")
        }
        graft.functions.ZValue(args(0), args(1), bits)
      }),

    (FunctionIdentifier("render_template"),
      info("render_template",
        "render_template(event, template) - render a Go-template route payload"),
      two("render_template") { (ev, tmpl) =>
        val t = tmpl match {
          case Literal(s: UTF8String, _) => s.toString
          case other => sys.error(
            s"render_template(event, template): template must be a string literal, got $other")
        }
        RenderTemplate(ev, t)
      }))

  /** Post-hoc registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, i, b) => Bridge.registerFunction(spark, id, i, b) }
}
