package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted plans for the §2.8 pipeline queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("sample_stratified", "corpus_ngrams", "quality_filter", "doc_pack", "token_ids")
    for (n <- names) {
      println(s"=== $n ===")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
