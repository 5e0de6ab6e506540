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

  test("z-order layout tightens row-group envelopes on BOTH keys") {
    val s = spark; import org.apache.spark.sql.functions._
    // sf0.01: partkey 0..1999, suppkey 0..99 — both keys carry enough
    // bits that z-refinement reaches the minor key within a row group
    // (at sf0.001 suppkey has 10 values: a 1/4-z-space group already
    // holds all of them and no layout could tighten it)
    val zDir = "/root/testdata/sf0.01"
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val z = Layout.zorderLayout(s, zDir)
      .select(col("l_partkey"), col("l_suppkey"), col("position"))
    // small row groups so the table yields many envelopes
    z.orderBy(col("position")).drop("position").coalesce(1)
      .write.option("parquet.block.size", 16 * 1024).parquet(s"$dir/zordered")
    val base = graft.sources.Tables.lineitem(s, zDir)
      .select(col("l_partkey"), col("l_suppkey")).coalesce(1)
    base.write.option("parquet.block.size", 16 * 1024).parquet(s"$dir/plain")

    def envelopeWidths(path: String, column: String): Seq[Long] = {
      val file = new java.io.File(path).listFiles
        .find(_.getName.endsWith(".parquet")).get
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        s.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala.find(_.getPath.toDotString == column).get
          val st = c.getStatistics
          st.genericGetMax.asInstanceOf[Long] - st.genericGetMin.asInstanceOf[Long]
        }
      } finally r.close()
    }
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val zp = envelopeWidths(s"$dir/zordered", "l_partkey")
    val zs = envelopeWidths(s"$dir/zordered", "l_suppkey")
    val pp = envelopeWidths(s"$dir/plain", "l_partkey")
    val ps = envelopeWidths(s"$dir/plain", "l_suppkey")
    assert(zp.size >= 3, s"want several row groups, got ${zp.size}")
    // BOTH keys' envelopes must tighten vs the unsorted layout (which
    // spans ~the full range per group). The keys' bit widths are
    // unbalanced (partkey 11 bits, suppkey 7), so interleaved
    // refinement reaches the major key ~4 splits earlier — expect a
    // deep cut on partkey and a real-but-smaller one on suppkey.
    assert(avg(zp) < 0.35 * avg(pp), s"partkey ${avg(zp)} vs ${avg(pp)}")
    assert(avg(zs) < 0.85 * avg(ps), s"suppkey ${avg(zs)} vs ${avg(ps)}")
  }

  test("scan-prune report: curve layouts dominate natural order on the 2-d predicate") {
    val s = spark; import org.apache.spark.sql.functions._
    // sf0.01 -> 8 simulated row groups: coarse, but the orderings
    // already separate (finer granularity only widens the gap)
    val rows = Layout.scanPruneReport(s, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(rows.size == 12, s"4 layouts x 3 predicates, got ${rows.size}")
    // natural/insertion order: every group spans both full key ranges,
    // so a min/max-pruning reader opens everything
    assert(rows(("natural", "pk_band")) == 1.0 &&
      rows(("natural", "both_bands")) == 1.0, rows.toString)
    // the single-key sort prunes its own key hard but is blind to the
    // other key
    assert(rows(("sort_partkey", "pk_band")) <= 0.5)
    assert(rows(("sort_partkey", "sk_band")) == 1.0)
    // both space-filling curves keep the 5% partkey band and the 2-d
    // box to a fraction of the groups (top curve bits follow the
    // wider key's high bits)
    for (l <- Seq("zorder", "hilbert")) {
      assert(rows((l, "pk_band")) <= 0.5, s"$l pk_band ${rows((l, "pk_band"))}")
      assert(rows((l, "both_bands")) <= rows((l, "pk_band")) &&
        rows((l, "both_bands")) < rows(("natural", "both_bands")),
        s"$l both_bands ${rows((l, "both_bands"))}")
    }
  }

  test("range bounds: buckets balanced to ±1 with ordered envelopes") {
    val rows = Layout.layoutRangeBounds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until Layout.rangeBuckets.toLong))
    val counts = rows.map(_._4)
    assert(counts.max - counts.min <= 1L,
      s"buckets must balance to ±1: ${counts.mkString(",")}")
    rows.foreach { case (b, lo, hi, _) => assert(lo <= hi, s"bucket $b") }
    // consecutive envelopes may touch on a tied key but never invert
    rows.sliding(2).foreach { case Array((_, _, hi1, _), (_, lo2, _, _)) =>
      assert(lo2 >= hi1, s"envelope inversion: hi $hi1 then lo $lo2")
    }
  }

  test("compaction collapses the fragmented landing files into few sorted ones") {
    val s = spark
    Layout.layoutCompact(s, sfDir).collect() // forces staging
    val root = Layout.compactStaged(s, sfDir)
    def parquets(p: String) = new java.io.File(p).listFiles
      .count(_.getName.endsWith(".parquet"))
    val before = parquets(s"$root/fragmented")
    val after = parquets(s"$root/compacted")
    assert(before >= 40, s"fragmented staging has $before files")
    assert(after <= Layout.compactTargetFiles, s"compacted to $after files")
    // lossless: row counts agree
    assert(s.read.parquet(s"$root/compacted").count() ==
      s.read.parquet(s"$root/fragmented").count())
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
