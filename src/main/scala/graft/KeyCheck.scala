package graft

/** Registry-invariant audit (dev tool): asserts no module's query key
  * silently shadows another's in the merged [[SparkEntry.queries]]
  * (Map ++ keeps the LAST binding — a collision would hide an
  * operator with no error anywhere), and lists the keys whose oracle
  * registers only at dump time (the staged-artifact family) so a
  * missing static oracle is a visible, explained set rather than a
  * surprise. Run: `sbt "runMain graft.KeyCheck"`. */
object KeyCheck {
  def main(args: Array[String]): Unit = {
    import graft.operators._
    val mods: Seq[(String, Map[String, _])] = Seq(
      "Relational" -> Relational.queries, "Accumulator" -> Accumulator.queries,
      "Iterators" -> Iterators.queries, "TextAnalysis" -> TextAnalysis.queries,
      "Dedup" -> Dedup.queries, "Similarity" -> Similarity.queries,
      "SimilarityIvf" -> SimilarityIvf.queries, "EmbedPq" -> EmbedPq.queries,
      "Pipeline" -> Pipeline.queries, "Layout" -> Layout.queries,
      "Multimodal" -> Multimodal.queries,
      "StreamAcc" -> graft.streaming.StreamAcc.queries,
      "StreamOps" -> graft.streaming.StreamOps.queries,
      "Behavioral" -> Behavioral.queries, "SourceFormats" -> SourceFormats.queries,
      "Graph" -> Graph.queries, "Sequences" -> Sequences.queries)
    val all = mods.flatMap { case (m, q) => q.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    println(s"modsum=${all.size} merged=${SparkEntry.queries.size} dups=${dups}")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    println(s"queries without oracle: ${noOracle.toSeq.sorted}")
  }
}
