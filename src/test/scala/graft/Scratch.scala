package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway micro-benchmark harness for the optimization round.
  * Not a spec; edited freely per experiment. */
object Scratch {
  def time(name: String, reps: Int = 3)(f: => DataFrame): Unit = {
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"SCRATCH $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val s = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = "/root/testdata/sf0.1"
    val li = graft.sources.Tables.lineitem(s, dir)
    println("scan partitions: " + li.rdd.getNumPartitions)

    println("distinct prices: " + li.select($"l_extendedprice").distinct().count())
    time("percentile array") {
      li.groupBy($"l_returnflag").agg(
        expr("percentile(l_extendedprice, array(CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)))").as("ps"),
        count(lit(1)).as("n"))
        .select($"l_returnflag", $"ps"(0).as("p50"), $"ps"(1).as("p95"), $"n")
    }
    def windowPct(pre: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val v0 = li.select($"l_returnflag".as("flag"), $"l_extendedprice".as("x"))
      val v = if (pre) v0.groupBy($"flag", $"x").agg(count(lit(1)).as("c"))
              else v0.withColumn("c", lit(1L))
      val w = Window.partitionBy($"flag").orderBy($"x")
      val cum = v.withColumn("cum", sum($"c").over(w))
      val tot = v.groupBy($"flag").agg(sum($"c").as("n"))
      val targets = tot.crossJoin(Seq(0.5, 0.95).toDF("p"))
        .withColumn("pos", $"p" * ($"n" - 1).cast("double"))
        .withColumn("lower", floor($"pos"))
        .withColumn("higher", ceil($"pos"))
        .withColumn("lo_rank", $"lower".cast("long") + 1)
        .withColumn("hi_rank", $"higher".cast("long") + 1)
      val picked = cum.as("r").join(broadcast(targets.as("t")),
          $"r.flag" === $"t.flag" &&
            (($"t.lo_rank" > $"r.cum" - $"r.c" && $"t.lo_rank" <= $"r.cum") ||
             ($"t.hi_rank" > $"r.cum" - $"r.c" && $"t.hi_rank" <= $"r.cum")))
        .groupBy($"t.flag".as("flag"), $"t.p".as("p"), $"t.pos".as("pos"),
          $"t.lower".as("lower"), $"t.higher".as("higher"), $"t.n".as("n"))
        .agg(min(when($"t.lo_rank" > $"r.cum" - $"r.c" && $"t.lo_rank" <= $"r.cum", $"r.x")).as("vlo"),
             min(when($"t.hi_rank" > $"r.cum" - $"r.c" && $"t.hi_rank" <= $"r.cum", $"r.x")).as("vhi"))
      picked.select($"flag", $"n",
          when($"lower" === $"higher", $"vlo")
            .otherwise(($"higher" - $"pos") * $"vlo" + ($"pos" - $"lower") * $"vhi").as("v"), $"p")
        .groupBy($"flag", $"n")
        .agg(expr(graft.functions.Agg.rndSql("min(CASE WHEN p = CAST(0.5 AS DOUBLE) THEN v END)", 4)).as("p50"),
             expr(graft.functions.Agg.rndSql("min(CASE WHEN p = CAST(0.95 AS DOUBLE) THEN v END)", 4)).as("p95"))
        .select($"flag", $"p50", $"p95", $"n").orderBy($"flag")
    }
    time("window pct raw") { windowPct(false) }
    time("window pct pre-agg") { windowPct(true) }
    windowPct(true).show(5)
    li.groupBy($"l_returnflag").agg(
        expr(graft.functions.Agg.rndSql("percentile(l_extendedprice, CAST(0.5 AS DOUBLE))", 4)).as("p50"),
        expr(graft.functions.Agg.rndSql("percentile(l_extendedprice, CAST(0.95 AS DOUBLE))", 4)).as("p95"),
        count(lit(1)).as("n")).orderBy($"l_returnflag").show(5)
    s.stop()
  }
}
