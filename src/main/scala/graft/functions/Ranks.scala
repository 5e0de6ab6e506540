package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable ranking helpers.
  *
  * A bare `row_number().over(Window.orderBy(k))` collapses the whole
  * dataset into ONE partition — fine at 60k rows, fatal at 100 TB.
  * [[globalRowNumber]] is the classic distributed layout instead:
  * range-partition by the key (Spark's TeraSort partitioner), number
  * rows within each sorted partition, and add per-partition offsets
  * computed from a tiny (numPartitions-row) broadcast side. Total
  * cost: one range shuffle + one broadcast join; every stage is
  * data-parallel.
  */
object Ranks {
  private val PID = "__graft_pid"
  private val OFF = "__graft_off"
  private val CNT = "__graft_cnt"

  /** The deploy-time parallelism knob: two-phase layouts derive their
    * range-partition counts from `spark.sql.shuffle.partitions`
    * instead of a hard-coded local constant — 32 range partitions of
    * a 10¹¹-row table would be ~3×10⁹ rows each; a cluster deploy
    * that sets shuffle.partitions for its executor count scales these
    * layouts with it (AQE coalesces the excess locally). */
  def defaultPartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Adds a 1-based global row number `out` ordered by `key`.
    * `key` must be unique for a deterministic result (ties would land
    * in range-partition-dependent order). */
  def globalRowNumber(df: DataFrame, key: Column, numPartitions: Int, out: String): DataFrame = {
    val parted = df.repartitionByRange(numPartitions, key).withColumn(PID, spark_partition_id())
    // Per-partition counts → exclusive prefix sum. numPartitions rows:
    // the single-partition window here is over driver-scale data.
    val offsets = parted.groupBy(col(PID)).agg(count(lit(1)).as(CNT))
      .withColumn(OFF, coalesce(
        sum(col(CNT)).over(
          Window.orderBy(col(PID)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop(CNT)
    parted.join(broadcast(offsets), PID)
      .withColumn(out,
        row_number().over(Window.partitionBy(col(PID)).orderBy(key)).cast("long") + col(OFF))
      .drop(PID, OFF)
  }

  /** Per-key arrival rank: a 1-based row number `out` within each
    * `keyCols` group ordered by `order` — the skew-safe replacement
    * for `row_number().over(Window.partitionBy(key).orderBy(order))`,
    * which hands EVERY row of one key to a single task's sort (fatal
    * when keys are low-cardinality "types": one hot key at 100 TB is
    * a multi-TB single-task sort). Layout, generalizing
    * [[globalRowNumber]] per group (the same shape as
    * `Relational.qPercentilesDist`'s rank stage): range-partition on
    * (key ++ order) so a hot key spreads over many partitions;
    * per-(key, partition) counts → per-key exclusive prefix sum over
    * ≤ numPartitions rows per key (tiny, broadcast back); finish with
    * a within-(key, partition) row_number plus the offset. Every
    * row-bearing stage is data-parallel. (key ++ order) must be a
    * unique composite or ties land in range-partition-dependent
    * order. */
  def perKeyRowNumber(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
                      numPartitions: Int, out: String): DataFrame = {
    val keys = keyCols.map(col)
    val parted = df.repartitionByRange(numPartitions, keys ++ order: _*)
      .withColumn(PID, spark_partition_id())
    val cnt = parted.groupBy(keys :+ col(PID): _*).agg(count(lit(1)).as(CNT))
    val offsets = cnt.withColumn(OFF, coalesce(
        sum(col(CNT)).over(
          Window.partitionBy(keys: _*).orderBy(col(PID))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop(CNT)
    parted.join(broadcast(offsets), keyCols :+ PID)
      .withColumn(out,
        row_number().over(
          Window.partitionBy(keys :+ col(PID): _*).orderBy(order: _*))
          .cast("long") + col(OFF))
      .drop(PID, OFF)
  }

  /** Adds a global running sum `out` of `value` ordered by `key` —
    * the same two-phase prefix-sum layout as [[globalRowNumber]]:
    * range-partition on the key, per-partition sums → exclusive
    * prefix over numPartitions rows, broadcast the offsets back and
    * finish with a within-partition running sum. No row-bearing stage
    * is ever a single partition. `key` must be unique (ties would sum
    * in range-partition-dependent order). */
  def globalRunningSum(df: DataFrame, key: Column, value: Column,
                       numPartitions: Int, out: String): DataFrame =
    globalRunningSum(df, Seq(key), value, numPartitions, out)

  /** Composite-key variant: the running sum is ordered by the `keys`
    * tuple (which must be unique as a composite) — the sweep-line
    * primitive ([[graft.operators.Relational.qIntervalOverlap]] orders
    * by (time, marker-kind, id)). */
  def globalRunningSum(df: DataFrame, keys: Seq[Column], value: Column,
                       numPartitions: Int, out: String): DataFrame = {
    val parted = df.repartitionByRange(numPartitions, keys: _*).withColumn(PID, spark_partition_id())
    val offsets = parted.groupBy(col(PID)).agg(sum(value).as(CNT))
      .withColumn(OFF, coalesce(
        sum(col(CNT)).over(
          Window.orderBy(col(PID)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop(CNT)
    parted.join(broadcast(offsets), PID)
      .withColumn(out,
        sum(value).over(Window.partitionBy(col(PID)).orderBy(keys: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) + col(OFF))
      .drop(PID, OFF)
  }
}
