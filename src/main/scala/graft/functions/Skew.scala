package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation layouts.
  *
  * AQE's skew-join splitting handles shuffle-time skew adaptively;
  * these helpers are the static layouts for the cases AQE can't fix:
  * a distinct-count whose per-key state explodes, and a join whose
  * hot key must be spread before the exchange exists.
  */
object Skew {

  /** Distinct count per key in two skew-free phases: the distinct
    * column is hash-partitioned into `nSalts` disjoint buckets, so
    * phase 1 shuffles on (key, salt) — no single reducer ever holds a
    * hot key's full distinct set — and phase 2 sums the disjoint
    * bucket counts. Exact, not approximate. */
  def saltedDistinctCount(df: DataFrame, key: Column, distinctCol: Column,
      nSalts: Int, out: String): DataFrame =
    df.groupBy(key, pmod(xxhash64(distinctCol), lit(nSalts)).as("__salt"))
      .agg(count_distinct(distinctCol).as("__partial"))
      .groupBy(key)
      .agg(sum(col("__partial")).as(out))

  /** Skew-spread equi-join: each row of the large side picks one of
    * `nSalts` lanes; the small side is replicated into every lane.
    * The shuffle key becomes (key, salt), splitting a hot key across
    * nSalts reducers. Result is row-identical to the plain join. */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, nSalts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
          saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
