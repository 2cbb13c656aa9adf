package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, MakeDecimal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DecimalType

/** Determinism protocol helpers (SURVEY.md §2.B).
  *
  * Oracle parity rules (every declared query follows these in BOTH the
  * Spark builder and the DuckDB SQL):
  *  - doubles produced by arithmetic are computed in DOUBLE (identical
  *    IEEE-754 ops in both engines), then cast to DECIMAL(18,4) BEFORE
  *    aggregation, so summation order can never flip a ulp;
  *  - timestamps are rendered as 'yyyy-MM-dd HH:mm:ss' strings;
  *  - integral computed outputs are cast to BIGINT (Spark ints vs DuckDB
  *    hugeint/bigint defaults differ);
  *  - every query has a total ORDER BY over its output columns.
  */
object Canon {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Cast to the canonical DECIMAL(18,4). */
  def dec(c: Column): Column = c.cast(Dec)

  /** Canonical timestamp rendering. DuckDB twin: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def tss(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Exact integral division (SQL `div`). `c / 1000L` is Spark DOUBLE
    * division: epoch-nanos (~1.7e18) exceed 2^53, so the long→double
    * conversion can round by up to ~128 ns before the cast truncates —
    * enough to land on the wrong microsecond. IntegralDivide stays in
    * long arithmetic end to end. */
  def divL(c: Column, d: Long): Column =
    Bridge.column(IntegralDivide(Bridge.expression(c), Bridge.expression(lit(d))))

  /** Long-nanos epoch → micro-precision timestamp (exact; see divL). */
  def nsToMicros(c: Column): Column = timestamp_micros(divL(c, 1000L))

  /** Long-nanos epoch → canonical string (for events.ts). DuckDB twin:
    * strftime(ts, ...) directly on its TIMESTAMP_NS column.
    *
    * r15: rendered by the [[graft.functions.NsToStrUtc]] codegen kernel
    * (integer civil-date arithmetic, bytes written directly) instead of
    * date_format∘timestamp_micros∘div — one expression, no
    * formatter/LocalDateTime/String per row. NsToStrSpec pins
    * bit-equality against the old chain over the full int64 domain;
    * UTC is the driver-surface contract (bench/Verify/oracle all pin
    * session tz UTC). */
  def nsToStr(c: Column): Column = graft.functions.NsToStrUtc.nsToStrUtc(c)

  def big(c: Column): Column = c.cast("long")

  /** Fast fixed-point DECIMAL(18,s) for the per-row casts feeding hot
    * aggregations. `cast(double as decimal)` goes through
    * BigDecimal.valueOf + setScale — several allocations per row, the
    * dominant cost of a decimal-protocol aggregate at scale. When the
    * input is a non-negative double representing an exact s-dp real
    * (the protocol's precondition anyway) with |x| < 9e14 / 10^s, the
    * unscaled long is just trunc(x*10^s + 0.5) — all primitive codegen
    * ops — and MakeDecimal builds the compact Decimal straight from it.
    * Bit-identical to the Cast on that domain; the aggregation buffer
    * still widens to BigDecimal-backed decimals on overflow, so sums
    * stay exact at any scale. */
  def decFix(c: Column, scale: Int = 4): Column = {
    val scaled = (c * math.pow(10, scale).toLong + 0.5).cast("long")
    Bridge.column(MakeDecimal(Bridge.expression(scaled), 18, scale))
  }

  /** Decimal-rounded DOUBLE — the canonical rendering for fractional
    * output columns. The value is stabilized by the DECIMAL(18,4) round
    * (so aggregation-order ulps can't leak out), then converted back to
    * double for the on-disk schema: decimal→double is the correctly-
    * rounded conversion in both engines, and a double column reads back
    * identically through any client (a DECIMAL column does not — column
    * readers differ on scale-preserving vs float rendering).
    * DuckDB twin: CAST(CAST(x AS DECIMAL(18,4)) AS DOUBLE). */
  def decD(c: Column): Column = dec(c).cast("double")

  /** Exact-rational ratios (k/n) can land exactly on a 4th-decimal tie,
    * where Spark's and DuckDB's double→decimal casts round differently.
    * Render them as floor(x*1e4 + 0.5) BIGINT instead — floor over an
    * explicitly computed double is the same IEEE op in both engines.
    * DuckDB twin: CAST(floor(x * 10000 + 0.5) AS BIGINT). */
  def ratio1e4(c: Column): Column = floor(c * 10000.0 + 0.5).cast("long")
}
