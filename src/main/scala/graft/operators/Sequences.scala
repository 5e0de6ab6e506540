package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.10 — generalized ordered-sequence matching (MATCH_RECOGNIZE's
  * strict-chain subset / the batch form of CEP pattern search).
  *
  * [[matchSteps]] is the reusable operator API behind
  * [[Behavioral.qFunnel]]'s fixed 3-step funnel: given an ordered
  * list of N step predicates, it finds each key's earliest
  * strictly-increasing occurrence chain — step k+1 matched by the
  * first qualifying event strictly after the step-k match — and
  * returns one row per key with each step's match time.
  *
  * Plan shape (the scale property): ONE sort per key partition
  * resolves ALL N steps — the chained running-min construction from
  * the funnel, generalized: with rows in (ts, id) order per key, the
  * running min of step-k match times makes "step k+1 strictly after
  * step k" decidable at each row, so N chained window columns over a
  * single exchange+sort replace N self-joins. The rollup then reuses
  * the same partitioning. An N-step pattern costs N window passes
  * over one sort — never N shuffles, never a per-key collect. */
object Sequences {

  /** One row per key that completed at least step 1:
    * `key, t1 … tN` (µs; null where the chain stopped). */
  def matchSteps(events: DataFrame, key: Column, ts: Column, id: Column,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "at least one step predicate")
    // the chain injects fixed working columns; an input frame already
    // carrying one of these names would be silently overwritten and
    // corrupt the match — fail loudly instead
    val reserved = Seq("__us", "__key") ++ steps.indices.map(i => s"__t${i + 1}")
    val clash = events.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"matchSteps reserves working columns ${reserved.mkString(", ")}; " +
        s"input frame already has ${clash.mkString(", ")} — rename before calling")
    // window and rollup both keyed on the SAME materialized column so
    // the final aggregate reuses the window's hash partitioning —
    // grouping a renamed copy would cost a second exchange
    var df = events.withColumn("__us", unix_micros(ts)).withColumn("__key", key)
    val w = Window.partitionBy(col("__key")).orderBy(ts, id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (stepPred, i) =>
      val qual = prev match {
        case None       => when(stepPred, col("__us"))
        case Some(pcol) => when(stepPred && col("__us") > col(pcol), col("__us"))
      }
      val tcol = s"__t${i + 1}"
      df = df.withColumn(tcol, min(qual).over(w))
      prev = Some(tcol)
    }
    val aggs = steps.indices.map(i => min(col(s"__t${i + 1}")).as(s"t${i + 1}"))
    // per-key min of each running-min column = the chain's final match
    // times (the running min is monotone non-increasing per key)
    df.groupBy(col("__key").as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("t1").isNotNull)
  }

  /** The driver-contract instance: 4-step signup → view → click →
    * purchase chains over events, one row per user reaching step 1,
    * with reach times and the depth reached. */
  val seqSteps = Seq("signup", "view", "click", "purchase")

  def qSequenceMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val m = matchSteps(ev, $"user_id", $"ts", $"event_id",
      seqSteps.map(t => $"event_type" === t))
    m.select($"key".as("user_id"),
        $"t1", $"t2", $"t3", $"t4",
        (coalesce(when($"t4".isNotNull, 4L), when($"t3".isNotNull, 3L),
          when($"t2".isNotNull, 2L), lit(1L))).as("depth"))
      .orderBy($"user_id")
  }

  /** Oracle: the join-chain formulation, one CTE per step, built
    * programmatically from the same step list. */
  val qSequenceMatchSql: String = {
    val stepCtes = seqSteps.zipWithIndex.map { case (t, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(CASE WHEN event_type = '$t' THEN epoch_us(ts) END) AS t1
           |  FROM events GROUP BY user_id)"""
      else
        s"""s${i + 1} AS (
           |  SELECT p.user_id, min(epoch_us(e.ts)) AS t${i + 1}
           |  FROM events e JOIN s$i p ON e.user_id = p.user_id
           |  WHERE e.event_type = '$t' AND p.t$i IS NOT NULL AND epoch_us(e.ts) > p.t$i
           |  GROUP BY p.user_id)"""
    }.map(_.stripMargin)
    val joins = (2 to seqSteps.size)
      .map(i => s"LEFT JOIN s$i ON s1.user_id = s$i.user_id").mkString("\n")
    val ts = (2 to seqSteps.size).map(i => s"s$i.t$i").mkString(", ")
    val depth = (seqSteps.size to 2 by -1)
      .map(i => s"WHEN s$i.t$i IS NOT NULL THEN $i").mkString(" ")
    s"""WITH ${stepCtes.mkString(",\n")}
       |SELECT s1.user_id, s1.t1, $ts,
       |  CAST(CASE $depth ELSE 1 END AS BIGINT) AS depth
       |FROM s1
       |$joins
       |WHERE s1.t1 IS NOT NULL
       |ORDER BY s1.user_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sequence_match" -> (qSequenceMatch _)
  )

  def oracles: Map[String, String] = Map(
    "q_sequence_match" -> qSequenceMatchSql
  )
}
