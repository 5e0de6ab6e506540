package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ranks
import graft.sources.Tables

class RanksSpec extends SparkSpec {

  test("globalRowNumber matches single-partition row_number") {
    val s = spark; import s.implicits._
    val df = Tables.orders(s, sfDir).select($"o_orderkey")
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy($"o_orderkey")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.globalRowNumber(df, $"o_orderkey", 7, "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("globalRunningSum matches single-partition cumulative sum") {
    val s = spark; import s.implicits._
    val df = Tables.orders(s, sfDir).select($"o_orderkey", $"o_custkey")
    val expected = df
      .withColumn("run", sum($"o_custkey").over(Window.orderBy($"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Ranks.globalRunningSum(df, $"o_orderkey", $"o_custkey", 7, "run")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("perKeyRowNumber matches a per-key window row_number") {
    val s = spark; import s.implicits._
    val df = Tables.events(s, sfDir).select($"event_type", $"ts", $"event_id")
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"ts", $"event_id")).cast("long"))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val got = Ranks.perKeyRowNumber(df, Seq("event_type"), Seq($"ts", $"event_id"), 7, "rn")
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("globalRowNumber survives partition counts larger than the data") {
    val s = spark; import s.implicits._
    val df = Seq(5L, 1L, 9L, 3L).toDF("k")
    val got = Ranks.globalRowNumber(df, $"k", 16, "rn")
      .orderBy($"rn").collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 1L), (3L, 2L), (5L, 3L), (9L, 4L)))
  }
}
