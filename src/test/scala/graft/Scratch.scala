package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = "/root/testdata/sf0.1"
    graft.operators.Graph.buildPagerankIndex(s, dir)
    val rp = graft.operators.Graph.pagerankRoundPlan(s)
    println("SCRATCH === round plan ===")
    println(rp.queryExecution.executedPlan.toString.take(3000))
    s.stop()
  }
}
