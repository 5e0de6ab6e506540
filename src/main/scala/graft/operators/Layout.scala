package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Ranks
import graft.sources.Tables

/** §2.9 Data-layout optimization.
  *
  * At 100 TB the scan you never run is the cheapest: parquet keeps
  * per-row-group min/max stats, so files CLUSTERED on the filter
  * columns let the reader skip almost everything. A single-column
  * sort clusters one predicate; [[zorderLayout]] interleaves the bits
  * of two keys (Morton / Z-order) so range predicates on EITHER
  * column stay clustered — the standard lakehouse layout trick
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`), built here from plain
  * column arithmetic plus the engine's two-phase global rank.
  */
object Layout {

  /** Bits kept per key (keys are masked into [0, 2^16)). */
  val zBits = 16

  /** The classic bit-spread: 16 significant bits spaced out to even
    * positions of a 32-bit word via magic masks. `shift` renders the
    * left shift per dialect (Spark SQL: `shiftleft(x, n)`; DuckDB:
    * `(x << n)`), everything else is shared integer arithmetic, so
    * both engines compute bit-identical z-values. */
  private def spread(x: String, shift: (String, Int) => String): String = {
    val s1 = s"((${x} | ${shift(x, 8)}) & 16711935)"        // 0x00FF00FF
    val s2 = s"(($s1 | ${shift(s1, 4)}) & 252645135)"       // 0x0F0F0F0F
    val s3 = s"(($s2 | ${shift(s2, 2)}) & 858993459)"       // 0x33333333
    s"(($s3 | ${shift(s3, 1)}) & 1431655765)"               // 0x55555555
  }

  private def zvalExpr(a: String, b: String, shift: (String, Int) => String): String = {
    val ma = s"($a & 65535)"
    val mb = s"($b & 65535)"
    s"(${spread(ma, shift)} | ${shift(spread(mb, shift), 1)})"
  }

  private val sparkShift: (String, Int) => String = (x, n) => s"shiftleft($x, $n)"
  private val duckShift: (String, Int) => String = (x, n) => s"($x << $n)"

  /** Z-order layout of lineitem on (l_partkey, l_suppkey): emits each
    * row's interleaved-bit z-value and its global write position. The
    * position comes from [[Ranks.globalRowNumber]] — a range shuffle
    * plus per-partition offsets, the TeraSort layout — never a
    * one-task `row_number() OVER (ORDER BY zval)`. Writing the table
    * in this order gives parquet row groups tight min/max envelopes
    * on BOTH keys: a predicate on either column prunes ~√(selectivity)
    * of the file set instead of scanning everything, which is the
    * difference between a 100 TB scan and a few-hundred-GB one. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .withColumn("zval", expr(zvalExpr("l_partkey", "l_suppkey", sparkShift)))
    // the synthetic lineitem has no unique (orderkey, linenumber) PK,
    // so the tiebreak covers every emitted column — rows identical in
    // all of them are interchangeable, which a hash compare can't see
    Ranks.globalRowNumber(keyed,
        Seq($"zval", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
        Ranks.defaultPartitions(keyed), "position",
        // bucket on the leading z-value alone: monotone in the full
        // order, and a single-column boundary chain stays codegen'd
        bucketKeys = Seq($"zval"))
      .select($"position", $"l_orderkey", $"l_linenumber",
        $"l_partkey", $"l_suppkey", $"zval")
      .orderBy($"position")
  }

  val zorderLayoutSql: String =
    s"""SELECT row_number() OVER (ORDER BY
       |    ${zvalExpr("l_partkey", "l_suppkey", duckShift)},
       |    l_orderkey, l_linenumber, l_partkey, l_suppkey) AS position,
       |  l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  ${zvalExpr("l_partkey", "l_suppkey", duckShift)} AS zval
       |FROM lineitem ORDER BY position""".stripMargin

  // ------------------------------------------------------------------
  // layout_partitioned — directory-partitioned writes + pruned scans
  // ------------------------------------------------------------------

  /** Session-level memo for the staged partitioned copy of events —
    * stands in for the production table that was WRITTEN partitioned
    * in the first place (the write is the layout operator; queries
    * only ever read it). */
  private val partStage = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def stagePartitioned(s: SparkSession, dir: String): String =
    partStage.getOrElseUpdate(dir, {
      import s.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-part").toString
      val ev = Tables.events(s, dir)
        .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
          $"event_type", $"value")
      graft.sources.Sinks.writePartitioned(ev, s"$out/events_by_type", "event_type")
      out
    })

  /** §2.9 #46b — partition-pruned scan over a directory-partitioned
    * table: events written `partitionBy(event_type)` (Hive layout,
    * [[graft.sources.Sinks.writePartitioned]]), then a two-type
    * filter aggregated per day. The filter matches the partition
    * column, so pruning happens at FILE LISTING time — non-matching
    * directories are never opened, let alone read (LayoutSpec asserts
    * the scanned file set via `inputFiles`). At 100 TB with a
    * date-partitioned fact table this is the first and biggest lever:
    * the scan is sized by the predicate, not the table. */
  def layoutPartitioned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Agg.dsum
    prunedScan(s, dir)
      .groupBy($"event_type", to_date(timestamp_micros($"us")).as("day"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"event_type", $"day")
  }

  /** The pruned read alone, exposed for LayoutSpec's file-set
    * assertion. */
  private[graft] def prunedScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"${stagePartitioned(s, dir)}/events_by_type")
      .filter(col("event_type").isin("purchase", "click"))
  }

  val layoutPartitionedSql: String = {
    import graft.functions.Agg.dsumSql
    s"""SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
       |  ${dsumSql("value")} AS sum_value
       |FROM events
       |WHERE event_type IN ('purchase', 'click')
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  /** Compaction targets: files per output table / rows per file cap. */
  val compactTargetFiles = 4
  val compactMaxRecords = 100000L

  private val compactStage = scala.collection.concurrent.TrieMap.empty[String, String]

  /** §2.9 #46c — small-file compaction (the lakehouse OPTIMIZE): a
    * landing table fragmented into dozens of tiny files (one per
    * micro-batch/task — the small-files problem that murders scan
    * planning and NameNode-style metadata at scale) rewritten into
    * [[compactTargetFiles]] range-partitioned, internally-sorted
    * files capped at [[compactMaxRecords]] rows. RepartitionByRange
    * on the sort key = one TeraSort-layout shuffle, so the compacted
    * files ALSO carry tight min/max envelopes on the key (compaction
    * and clustering in the same pass). The query proves losslessness
    * by aggregating the compacted table against the original-table
    * oracle; LayoutSpec asserts the file geometry. */
  def layoutCompact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Agg.dsum
    val root = compactStaged(s, dir)
    s.read.parquet(s"$root/compacted")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"),
        min($"us").as("min_us"), max($"us").as("max_us"))
      .orderBy($"event_type")
  }

  private[graft] def compactStaged(s: SparkSession, dir: String): String =
    compactStage.getOrElseUpdate(dir, {
      import s.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
      val ev = Tables.events(s, dir)
        .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
          $"event_type", $"value")
      // the fragmented landing state: 48 tiny files
      ev.repartition(48).write.parquet(s"$out/fragmented")
      s.read.parquet(s"$out/fragmented")
        .repartitionByRange(compactTargetFiles, $"us")
        .sortWithinPartitions($"us")
        .write.option("maxRecordsPerFile", compactMaxRecords)
        .parquet(s"$out/compacted")
      out
    })

  val layoutCompactSql: String = {
    import graft.functions.Agg.dsumSql
    s"""SELECT event_type, count(*) AS n_events,
       |  ${dsumSql("value")} AS sum_value,
       |  min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder"      -> (zorderLayout _),
    "layout_partitioned" -> (layoutPartitioned _),
    "layout_compact"     -> (layoutCompact _)
  )

  def oracles: Map[String, String] = Map(
    "layout_zorder"      -> zorderLayoutSql,
    "layout_partitioned" -> layoutPartitionedSql,
    "layout_compact"     -> layoutCompactSql
  )
}
