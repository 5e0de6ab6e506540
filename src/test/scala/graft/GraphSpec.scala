package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  /** Star basket graph: order 1 = {10, 11}, order 2 = {10, 12} →
    * part 10 is the hub (degree 2), 11/12 symmetric leaves. */
  private lazy val starDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-graph").toString
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .select($"l_orderkey", $"l_partkey", lit(1L).as("l_suppkey"),
        lit(1).as("l_linenumber"), lit(1.0).as("l_quantity"),
        lit(1.0).as("l_extendedprice"), lit(0.0).as("l_discount"),
        lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("pagerank conserves mass and ranks the hub above symmetric leaves") {
    val r = Graph.graphPagerank(spark, starDir).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    // symmetric graph, no dangling vertices: total mass stays 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.toString)
    assert(r(11L) == r(12L), "symmetric leaves must tie exactly")
    assert(r(10L) > r(11L), "hub collects both leaves' mass")
  }

  test("pagerank is partition-invariant") {
    val s = spark
    val a = Graph.graphPagerank(s, sfDir).collect().map(_.toSeq).toSeq
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Graph.graphPagerank(s, sfDir).collect().map(_.toSeq).toSeq
      assert(a == b, "ranks must be bit-identical under any partitioning")
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
