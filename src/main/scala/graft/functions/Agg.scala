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

  /** Exact, order-independent sum of a double column, as double.
    *
    * Fixed-point at 1e-4: `round(x*10000)` is pure IEEE double math —
    * bit-identical across engines — and the rounded value is an exact
    * integer, so the long→decimal cast is lossless (unlike a direct
    * double→DECIMAL cast, where Spark rounds the *shortest string*
    * repr while DuckDB rounds the exact binary expansion, drifting at
    * ~1e-11). The decimal sum is exact and order-independent. */
  def dsum(c: Column): Column =
    (sum(round(c * lit(10000)).cast(D0)).cast("double") / lit(10000.0))

  /** DuckDB-side rendering of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"(CAST(sum(CAST(round(($expr) * 10000) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0)"

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
