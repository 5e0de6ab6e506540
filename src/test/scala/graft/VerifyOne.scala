package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Ad-hoc single-query verify harness (dev tool, not a spec):
  * `sbt "Test/runMain graft.VerifyOne <sfDir> <outDir> <query> [query...]"`
  * dumps just the named queries + their oracle rows so
  * `tools/check.py <sfDir> <outDir>` checks only them — the fast
  * inner loop while an operator's oracle parity is being worked out.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
