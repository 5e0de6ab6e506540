package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.{Accumulator, Behavioral, Dedup, EmbedPq, Graph, Iterators, Layout, Multimodal, Pipeline, Relational, Similarity, SimilarityIvf, Sequences, SourceFormats, TextAnalysis}
import graft.streaming.{StreamAcc, StreamOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5RegionVolume(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Accumulator.queries ++ Iterators.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      SimilarityIvf.queries ++ EmbedPq.queries ++ Pipeline.queries ++ Layout.queries ++
      Multimodal.queries ++ StreamAcc.queries ++ StreamOps.queries ++
      Behavioral.queries ++ SourceFormats.queries ++ Graph.queries ++ Sequences.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Accumulator.oracles ++ Iterators.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      SimilarityIvf.oracles ++ EmbedPq.oracles ++
      Pipeline.oracles ++ Layout.oracles ++
      Multimodal.oracles ++ StreamAcc.oracles ++ StreamOps.oracles ++
      Behavioral.oracles ++ SourceFormats.oracles ++ Graph.oracles ++ Sequences.oracles
}
