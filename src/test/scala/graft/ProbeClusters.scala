package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: sub-stage attribution for the cluster-family
  * queries (dev tool, not a spec). */
object ProbeClusters {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    graft.operators.Graph.graphComponents(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    graft.operators.Dedup.dedupClustersEmbedding(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 2) {
      t(s"graph_components full pass$pass") {
        graft.operators.Graph.graphComponents(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"strongEdges count pass$pass") {
        graft.operators.Graph.strongEdges(spark, dir).count()
      }
      t(s"embed clusters full pass$pass") {
        graft.operators.Dedup.dedupClustersEmbedding(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"embeddingPairs count pass$pass") {
        graft.operators.Dedup.embeddingPairs(spark, dir).count()
      }
      t(s"universe scan pass$pass") {
        graft.sources.Tables.embeddings(spark, dir).select($"vec_id").count()
      }
      // split: edge materialization / loop / final assembly
      val pairs = graft.operators.Graph.strongEdges(spark, dir)
        .select($"u".as("doc1"), $"v".as("doc2"))
      val universe = graft.sources.Tables.part(spark, dir)
        .select($"p_partkey".as("doc_id"))
      val edges = t(s"gc edges persist+count pass$pass") {
        val p = pairs.select($"doc1", $"doc2")
        val e = p.union(p.select($"doc2", $"doc1")).toDF("src", "dst").persist()
        e.count(); e
      }
      val assembled = t(s"gc clustersOfEdges setup+loop pass$pass") {
        graft.operators.Dedup.clustersOfEdges(spark, universe, edges,
          graft.operators.Dedup.maxClusterIters)
      }
      t(s"gc final assembly noop pass$pass") {
        assembled.write.format("noop").mode("overwrite").save()
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
