package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the test-data star schema.
  *
  * Plain `spark.read.parquet` so Catalyst owns pushdown: any filter /
  * projection applied downstream reaches the scan (verified in
  * PlanSpec). At deployment scale the same loaders point at
  * partitioned parquet roots and partition pruning applies unchanged.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame     = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = read(s, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong (set in GraftSession) it reads
    * as a long which we floor-convert to a microsecond timestamp —
    * matching DuckDB, whose native timestamp resolution is µs. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = read(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame  = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** Generic loaders for non-parquet landing formats. Schema is
    * mandatory: schema inference reads the data twice and guesses —
    * at 100 TB both are unacceptable. */
  def readCsv(s: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonLines(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).json(path)
}
