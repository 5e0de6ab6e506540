package graft
import org.apache.spark.sql.SparkSession

object DebugOpq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[16]"), 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val df = operators.EmbedPq.annOpq(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
