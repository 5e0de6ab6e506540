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
    graft.operators.Graph.buildPagerankIndex(s, dir)
    val e = s.table("graft_pagerank_edges")
    val deg = tm("deg") { e.groupBy($"src").agg(count(lit(1)).as("outdeg")).localCheckpoint(true) }
    val n = deg.count()
    var state = deg.select($"src".as("id"), $"outdeg", (lit(1.0)/lit(n.toDouble)).as("rank")).localCheckpoint(true)
    for (k <- 1 to 5) {
      tm(s"round$k") {
        val contribs = state.select($"id", expr("CAST(floor(rank / outdeg * 1e12 + 0.5D) AS BIGINT)").as("cq"))
        val sums = e.join(contribs, e("src") === contribs("id"))
          .groupBy($"dst").agg(sum($"cq").as("sq"))
        state = deg.join(sums, deg("src") === sums("dst"))
          .select($"src".as("id"), $"outdeg",
            (lit(0.15)/lit(n.toDouble) + lit(0.85) * ($"sq".cast("double")/lit(1e12))).as("rank"))
          .localCheckpoint(true)
      }
      if (k == 2) {
        val contribs = state.select($"id", expr("CAST(floor(rank / outdeg * 1e12 + 0.5D) AS BIGINT)").as("cq"))
        val sums = e.join(contribs, e("src") === contribs("id")).groupBy($"dst").agg(sum($"cq").as("sq"))
        println("SCRATCH === round-3 plan (state from loop) ===")
        println(sums.queryExecution.executedPlan.toString.take(1800))
      }
    }
    s.stop()
  }
}
