package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.SparkTestBase
import graft.functions.VectorOps.{vectorDot, vectorNorm}

/** The codegen kernels must be bit-identical to the composable HOF
  * formulation they replace (aggregate(zip_with(...)) fold-left seeded
  * at 0.0) on both float and double arrays — that identity is what keeps
  * the DuckDB oracle twins hash-stable. */
class VectorOpsSpec extends SparkTestBase with TableDrivenPropertyChecks {

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  private def hofNorm = (a: org.apache.spark.sql.Column) =>
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))

  test("vectorDot/vectorNorm bit-identical to HOF fold on double arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      vectorDot(col("a"), col("b")).as("kd"),
      hofDot(col("a"), col("b")).as("hd"),
      vectorNorm(col("a")).as("kn"),
      hofNorm(transform(col("a"), x => x)).as("hn")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("float arrays widen exactly like transform(cast to double)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(32)(rnd.nextFloat() * 2 - 1),
      Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val cast = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))
    val out = df.select(
      vectorDot(col("a"), col("b")).as("kd"),
      hofDot(cast(col("a")), cast(col("b"))).as("hd"),
      vectorNorm(col("a")).as("kn"),
      hofNorm(cast(col("a"))).as("hn")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("null array yields null; empty arrays yield 0.0 dot and 0.0 norm") {
    import spark.implicits._
    val df = Seq((Some(Array.empty[Double]), Some(Array.empty[Double])),
      (None, Some(Array(1.0)))).toDF("a", "b")
    val rows = df.select(vectorDot(col("a"), col("b")), vectorNorm(col("a"))).collect()
    assert(rows(0).getDouble(0) === 0.0 && rows(0).getDouble(1) === 0.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }
}
