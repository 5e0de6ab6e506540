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

  /** Native [[DotProduct]] — same left-to-right order as DuckDB's
    * list_dot_product, ~100× the throughput of aggregate+zip_with. */
  def dot(a: String, b: String): String = s"graft_dot($a, $b)"

  def norm(a: String): String = s"sqrt(graft_dot($a, $a))"
}
