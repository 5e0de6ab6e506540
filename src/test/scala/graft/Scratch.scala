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
    val sup = graft.sources.OracleStage.stage(s, "copurchase_support", dir) {
      val li = graft.sources.Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey").distinct()
      li.as("a").join(li.as("b"),
          $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
        .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
        .agg(count(lit(1)).as("n_ab"))
    }
    val edges = sup.select($"u".as("src"), $"v".as("dst"))
      .unionAll(sup.select($"v".as("src"), $"u".as("dst")))
    val eSrc = edges.repartition($"src").localCheckpoint(true)
    val eDst = edges.repartition($"dst").localCheckpoint(true)

    def loop(e: DataFrame, ckptEvery: Int, bc: Boolean, tag: String): Unit = tm(tag) {
      val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
      val n = deg.count()
      var state = deg.select($"src".as("id"), $"outdeg",
          (lit(1.0) / lit(n.toDouble)).as("rank")).localCheckpoint(true)
      for (k <- 1 to 5) {
        val contribs0 = state.select($"id",
          expr("CAST(floor(rank / outdeg * 1e12 + 0.5D) AS BIGINT)").as("cq"))
        val contribs = if (bc) broadcast(contribs0) else contribs0
        val sums = e.join(contribs, e("src") === contribs("id"))
          .groupBy($"dst").agg(sum($"cq").as("sq"))
        val degj = if (bc) broadcast(deg) else deg
        state = degj.join(sums, deg("src") === sums("dst"))
          .select($"src".as("id"), $"outdeg",
            (lit(0.15) / lit(n.toDouble) + lit(0.85) * ($"sq".cast("double") / lit(1e12))).as("rank"))
        if (k % ckptEvery == 0 && k < 5) state = state.localCheckpoint(true)
      }
      state.select($"id".as("part_id"), $"rank").orderBy($"part_id")
        .write.format("noop").mode("overwrite").save()
    }
    loop(eSrc, 1, false, "warm")
    for (i <- 1 to 2) {
      loop(eSrc, 1, false, s"src-auto$i")
      loop(eSrc, 1, true, s"src-bc$i")
      loop(eDst, 1, false, s"dst-auto$i")
      loop(eDst, 1, true, s"dst-bc$i")
    }
    s.stop()
  }
}
