package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness (dev tool, not a spec):
  * `sbt "Test/runMain graft.TimeOne <query> [query...]"` times each
  * named query at sf0.1 after an sf0.001 warmup. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"TIMEONE $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
