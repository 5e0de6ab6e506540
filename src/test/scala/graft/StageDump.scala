package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: dump `.explain("formatted")` for INTERNAL stage frames
  * whose enclosing query hides them behind eager checkpoints (the
  * round-13 verdict called out vacuous checkpoint-scan dumps as
  * non-evidence). Each named stage builds the frame exactly the way
  * the operator's hot path does. Usage:
  *   sbt "Test/runMain graft.StageDump <tag> <suffix> <stage> [stage...]"
  * Output lands in plans/<tag>/<stage>_<suffix>.txt. Data dir from
  * SPARK_GRAFT_SF_DIR (default sf0.1). */
object StageDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1); val names = args.drop(2).toSeq
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    import org.apache.spark.sql.functions._
    def stage(n: String): DataFrame = n match {
      case "dedup_jaccard_prefix_cand" =>
        // the candidate stage, built over the pinned doc-array frame
        // exactly as dedupJaccardPrefix stages it
        graft.operators.Dedup.jaccardPrefixCand(
          graft.operators.Dedup.jaccardPrefixDocs(spark, dir).localCheckpoint(true))
      case "cluster_round" =>
        // one full label-propagation round exactly as the current
        // clustersOfEdges loop builds it (requires the index build)
        graft.operators.Dedup.buildEmbedClusterIndex(spark, dir)
        graft.operators.Dedup.clusterRoundPlan(spark)
      case "cluster_round_r13" =>
        // the round-13 loop body verbatim (edge⋈label join, union-min,
        // pointer jump, prev-join changed flag) over the persisted
        // embed-cluster edge index — kept inline so the before-plan can
        // be dumped against any tree
        graft.operators.Dedup.buildEmbedClusterIndex(spark, dir)
        val edges = spark.table(graft.operators.Dedup.embedClusterIndexTable)
        val labels = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("label", col("doc_id")).localCheckpoint(true)
        val prop = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
          .select(col("dst").as("doc_id"), col("label"))
        val minned = labels.union(prop).groupBy(col("doc_id"))
          .agg(min(col("label")).as("label"))
        val jumped = minned.join(
            minned.select(col("doc_id").as("label"), col("label").as("jump")),
            Seq("label"))
          .select(col("doc_id"), col("jump").as("label"))
        jumped
          .join(labels.select(col("doc_id"), col("label").as("prev_label")), "doc_id")
          .withColumn("chg", col("label") =!= col("prev_label"))
          .select(col("doc_id"), col("label"), col("chg"))
      case other =>
        // fall back to a registered query's surface plan
        SparkEntry.queries(other)(spark, dir)
    }
    for (n <- names) {
      val df = stage(n)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"STAGEDUMP wrote plans/$tag/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
