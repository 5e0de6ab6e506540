package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    import graft.functions.{Ranks, Quantiles}
    val v = graft.sources.Tables.lineitem(s, dir)
      .select($"l_returnflag".as("flag"), $"l_extendedprice".as("x"))
    val np = Ranks.defaultPartitions(v)
    // warm sampling memo
    tm("warm-bracketed") { Quantiles.bracketed(v, Seq("flag"), "x", Seq(0.5, 0.95), np)
      .write.format("noop").mode("overwrite").save() }
    for (i <- 1 to 2) {
      val parted = Ranks.withBucket(v, Seq($"flag", $"x"), np, "__q_pid")
      tm(s"parted-noop$i") { parted.write.format("noop").mode("overwrite").save() }
      tm(s"cnt$i") { parted.groupBy($"flag", col("__q_pid")).agg(count(lit(1)).as("__c"))
        .write.format("noop").mode("overwrite").save() }
      tm(s"bracketed$i") { Quantiles.bracketed(v, Seq("flag"), "x", Seq(0.5, 0.95), np)
        .write.format("noop").mode("overwrite").save() }
      tm(s"full-dist$i") { graft.operators.Relational.queries("q_percentiles_dist")(s, dir)
        .write.format("noop").mode("overwrite").save() }
    }
    s.stop()
  }
}
