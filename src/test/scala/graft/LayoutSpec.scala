package graft

import graft.operators.{Layout, SourceFormats}

class LayoutSpec extends SparkSpec {

  test("partitioned scan opens only the matching partition directories") {
    val df = Layout.prunedScan(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    // the filter prunes at file-listing time: the scan's file count
    // equals the files under the TWO matching partition dirs alone
    // (Dataset.inputFiles would show the unpruned listing)
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val root = new java.io.File(
      Layout.stagePartitioned(spark, sfDir) + "/events_by_type")
    val expected = root.listFiles
      .filter(d => d.getName == "event_type=purchase" || d.getName == "event_type=click")
      .flatMap(_.listFiles).count(_.getName.endsWith(".parquet"))
    assert(expected > 0)
    assert(scan.metrics("numFiles").value == expected,
      s"scan read ${scan.metrics("numFiles").value} files, want $expected")
  }

  test("text-format readers parse without corrupt-row fallout") {
    val s = spark; import s.implicits._
    // _corrupt_record absent = every line parsed under the mandatory
    // schema; a schema drift or quoting bug would surface null rows
    val out = SourceFormats.sourceFormats(s, sfDir).collect()
    assert(out.length == 10) // 2 formats × 5 event types
    val byFormat = out.groupBy(_.getString(0)).view.mapValues(_.map(r =>
      (r.getString(1), r.getLong(2), r.getDouble(3))).toSet).toMap
    assert(byFormat("csv") == byFormat("jsonl"), "formats must agree exactly")
  }
}
