package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: reproduce the corpus_shuffle position corruption at a
  * given SF and print the FINAL adaptive plan. */
object DebugShuffle {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[16]"), 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val df = operators.Pipeline.corpusShuffle(spark, dir)
    val rows = df.collect()
    val pos = rows.map(_.getLong(0))
    println(s"rows=${rows.length} distinctPos=${pos.distinct.length} " +
      s"min=${pos.min} max=${pos.max}")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
