package graft.functions

/** Vector arithmetic as SQL expression fragments over array columns.
  *
  * Built-in higher-order functions (`zip_with`/`transform`/
  * `aggregate`) instead of UDFs: they stay inside whole-stage
  * codegen, and the left-to-right accumulation order is identical to
  * DuckDB's list kernels, which keeps cosine values bit-comparable
  * for the oracle checks.
  */
object VectorFns {
  /** float[] → double[] (exact widening; all math in double). */
  def asDouble(col: String): String = s"transform($col, x -> CAST(x AS DOUBLE))"

  def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  def norm(a: String): String =
    s"sqrt(aggregate(transform($a, x -> x * x), 0D, (acc, x) -> acc + x))"
}
