package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Scratch {
  def tm[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"SCRATCH $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = "/root/testdata/sf0.1"
    import graft.operators.Dedup
    val edges0 = Dedup.embeddingPairs(s, dir).select($"id1".as("doc1"), $"id2".as("doc2"))
    val edges = edges0.select($"doc1".as("src"), $"doc2".as("dst"))
      .union(edges0.select($"doc2".as("src"), $"doc1".as("dst"))).localCheckpoint(true)

    def run(nJumps: Int, tag: String): Unit = tm(tag) {
      var labels = edges.select($"src".as("doc_id")).distinct()
        .withColumn("label", $"doc_id").localCheckpoint(true)
      var changed = 1L; var rounds = 0
      while (changed > 0 && rounds < 60) {
        val prev = labels
        val prop = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
          .select($"dst".as("doc_id"), $"label")
        var m = prev.union(prop).groupBy($"doc_id").agg(min($"label").as("label"))
        for (_ <- 1 to nJumps) {
          val mapSide = m.select($"doc_id".as("__k"), $"label".as("__v"))
          m = m.join(mapSide, m("label") === mapSide("__k"))
            .select(m("doc_id"), col("__v").as("label"))
        }
        val next = m.join(prev.select($"doc_id", $"label".as("prev_label")), "doc_id")
          .withColumn("chg", $"label" =!= $"prev_label")
          .select($"doc_id", $"label", $"chg").localCheckpoint(true)
        changed = next.filter($"chg").count()
        labels = next.select($"doc_id", $"label")
        rounds += 1
      }
      println(s"SCRATCH $tag rounds=$rounds n=" + labels.count())
    }
    run(1, "warm")
    for (i <- 1 to 2) { run(0, s"j0-$i"); run(1, s"j1-$i"); run(2, s"j2-$i"); run(3, s"j3-$i") }
    s.stop()
  }
}
