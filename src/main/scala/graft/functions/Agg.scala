package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation helpers shared by all operators.
  *
  * Double sums are order-dependent under IEEE-754, and Spark's
  * partial-aggregate tree changes the addition order run to run and
  * engine to engine. Every "sum of doubles" in the engine therefore
  * casts each operand to DECIMAL(18,4) first (exact, commutative
  * addition — result independent of partitioning) and converts the
  * final exact sum back to double. This is what makes results
  * bit-identical to the DuckDB oracle AND deterministic across
  * cluster sizes — a correctness property at 1000 executors, not
  * just a test convenience.
  */
object Agg {
  private val D0 = DecimalType(38, 0)

  /** Round-half-up quantization in pure double arithmetic.
    * `floor(x·10ˢ + 0.5)` instead of `round(...)`: Spark's round on
    * doubles allocates a BigDecimal per row; floor is a native op,
    * bit-identical across engines, and the result is an exact
    * integer-valued double. Used identically on both sides of every
    * oracle. */
  def quantize(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5))
  }

  /** Half-up rounding to `scale` decimals as a double (the portable,
    * codegen-friendly replacement for round(c, scale)). */
  def rnd(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    quantize(c, scale).cast("double") / lit(p)
  }

  /** SQL fragment for [[rnd]] — valid (and identical) in both Spark
    * SQL and DuckDB. The explicit DOUBLE cast matters: Spark parses
    * `0.5`/`1000000.0` literals as DECIMAL and would otherwise
    * promote the division to (slow, BigDecimal-backed) decimal. */
  def rndSql(expr: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"(CAST(floor(($expr) * $p + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST($p AS DOUBLE))"
  }

  /** Exact, order-independent sum of a double column, as double.
    *
    * Fixed-point at 1e-4: quantized values are exact integers, so the
    * long→decimal cast stays on Decimal's compact (long-backed) fast
    * path — no BigDecimal per row — and the decimal sum is exact and
    * commutative: the result is independent of partitioning, which is
    * a correctness property at 1000 executors, not just a test
    * convenience. DECIMAL(38) headroom: a 100 TB fact table (~10¹¹
    * rows × ~10⁹ quantized units) sums to ~10²⁰, far inside range. */
  def dsum(c: Column): Column =
    (sum(quantize(c, 4).cast("long").cast(D0)).cast("double") / lit(10000.0))

  /** DuckDB-side rendering of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"(CAST(sum(CAST(floor(($expr) * 10000 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0)"

  /** Exact mean: exact decimal sum divided (in double) by count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / count(*))"

  /** Portable conditional count: Spark sum(int)=BIGINT, DuckDB needs
    * an explicit cast (its integer sum is HUGEINT). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  def countIfSql(cond: String): String =
    s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)"
}
