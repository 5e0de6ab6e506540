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
    val q = graft.operators.Relational.queries("q_interval_overlap")
    q(s, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      tm(s"interval$i") { q(s, dir).write.format("noop").mode("overwrite").save() }
    }
    val q2 = graft.operators.Relational.queries("q_events_sessionize")
    for (i <- 1 to 2) {
      tm(s"sessionize$i") { q2(s, dir).write.format("noop").mode("overwrite").save() }
    }
    s.stop()
  }
}
