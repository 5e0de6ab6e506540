package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ranks
import graft.sources.Tables

class RanksSpec extends SparkSpec {

  test("a hot key spreads across buckets — no single-task sort at any skew") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // 100k rows of ONE key: the shape that makes a per-key window a
    // single-task sort. perKeyRowNumber must spread it over many
    // buckets and still produce the exact dense 1..n arrival rank.
    val n = 100000L
    val df = s.range(n).select(lit("hot").as("k"), $"id".as("ord"))
    val parts = graft.functions.Ranks.defaultPartitions(df)
    val ranked = graft.functions.Ranks.perKeyRowNumber(
      df, Seq("k"), Seq(col("ord")), parts, "rn")
    // bucket balance: the internal pid is dropped, so measure through
    // the public contract — within-bucket work equals within-bucket
    // count; check the largest contiguous rank run assigned to one
    // bucket by re-deriving the bucket split from rank jumps is not
    // observable here, so assert balance on the bucketed frame itself
    val bucketed = graft.functions.Ranks.withBucket(
      df, Seq(col("k"), col("ord")), parts, "pid")
    val sizes = bucketed.groupBy($"pid").count().collect().map(_.getLong(1))
    assert(sizes.length > 1, s"hot key stayed in one bucket: ${sizes.toSeq}")
    assert(sizes.max < n, s"one bucket holds everything: ${sizes.toSeq}")
    // and correctness: exact dense arrival rank
    val ranks = ranked.select($"rn").as[Long].collect().sorted
    assert(ranks.head == 1L && ranks.last == n && ranks.length == n.toInt)
    assert(ranks.toSet.size == n.toInt)
  }

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

  test("globalRunningSums: N columns in one layout match N chained passes") {
    val s = spark; import s.implicits._
    val df = Tables.orders(s, sfDir)
      .select($"o_orderkey", $"o_custkey",
        ($"o_custkey" % 7).as("v2"), lit(1L).as("one"))
    val w = Window.orderBy($"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("r1", sum($"o_custkey").over(w))
      .withColumn("r2", sum($"v2").over(w))
      .withColumn("r3", sum($"one").over(w))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val got = Ranks.globalRunningSums(df, Seq($"o_orderkey"),
        Seq(($"o_custkey", "r1"), ($"v2", "r2"), ($"one", "r3")), 7)
      .select($"o_orderkey", $"r1", $"r2", $"r3")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
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

  test("seeded property sweep: adversarial key distributions × partition counts") {
    // the two-phase primitives sample bucket boundaries from the
    // data, so the rarity class to hunt is duplicate-heavy keys
    // landing ON sampled boundaries. Sweep hostile shapes (all-equal,
    // two-valued, modular dups, head-skew, signed randoms, singleton)
    // across partition counts and demand exact equality with the
    // single-partition window reference — rank AND running sum.
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "all-equal"  -> Seq.fill(4000)((7L, 1L)),
      "two-values" -> Seq.fill(4000)((rnd.nextInt(2).toLong, rnd.nextInt(5).toLong)),
      "mod-dups"   -> (0 until 6000).map(i => ((i % 37).toLong, (i % 11).toLong - 5L)),
      "head-skew"  -> ((0 until 5000).map(_ => (0L, 2L)) ++
        (0 until 100).map(i => (i.toLong + 1, 3L))),
      "signed-rnd" -> (0 until 4000).map(_ =>
        (rnd.nextLong() % 1000L, rnd.nextLong() % 50L)),
      "singleton"  -> Seq((5L, 9L))
    )
    for ((name, data) <- shapes; parts <- Seq(1, 2, 7, 32)) {
      val df = data.zipWithIndex
        .map { case ((k, v), id) => (k, v, id.toLong) }
        .toDF("k", "v", "id")
      val w = Window.orderBy($"k", $"id")
      val refRows = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("run", sum($"v").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4))).toMap
      val gotRn = Ranks.globalRowNumber(df, Seq($"k", $"id"), parts, "rn")
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      val gotRun = Ranks.globalRunningSum(df, Seq($"k", $"id"), $"v", parts, "run")
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      refRows.foreach { case (id, (rn, run)) =>
        assert(gotRn(id) == rn,
          s"[$name parts=$parts] rank diverges at id=$id: ${gotRn(id)} vs $rn")
        assert(gotRun(id) == run,
          s"[$name parts=$parts] running sum diverges at id=$id: ${gotRun(id)} vs $run")
      }
    }
  }
}
