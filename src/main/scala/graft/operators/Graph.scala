package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.12 Graph analytics.
  *
  * Iterative vertex-propagation workloads on a Spark engine are the
  * same plan shape as [[Dedup.dedupClusters]]' label propagation:
  * an edge table joined to a small vertex-state frame per round, the
  * state re-aggregated, the lineage cut per iteration. PageRank is
  * the canonical instance and exercises the piece the cluster
  * operator doesn't: FLOATING-POINT iteration that must stay
  * bit-identical across engines and partitionings.
  *
  * Determinism device: each round's incoming mass per vertex is a sum
  * of `rank/outdeg` doubles — order-dependent under IEEE-754. Every
  * contribution is therefore half-up-quantized at 1e-12 and summed as
  * LONG (exact, commutative; ≤1e12 per edge × fan-in ≪ 2⁶³), and the
  * new rank is derived from that exact integer by identical
  * left-to-right double arithmetic on both engines. The oracle unrolls
  * the same recurrence as chained CTEs — iteration count is a
  * compile-time constant on both sides.
  *
  * Scale notes (100 TB): the co-purchase edge build is a self-join on
  * o_orderkey — one shuffle, per-order fan-out bounded by basket size
  * (k² pairs on a k-item order), distinct partial-aggregated. Each
  * round is one edge⋈state shuffle (state is vertex-sized, AQE may
  * broadcast it) + one partial-agged sum; `localCheckpoint` caps the
  * lineage so round N's plan doesn't replay rounds 1..N−1.
  */
object Graph {

  val pagerankIters = 5
  val damping = 0.85
  /** Lineage-cut period for the iteration loop. Every round: an
    * UNCUT chain measured 3× slower at sf0.1 (AQE re-plans the whole
    * growing DAG per stage and the edge cache doesn't amortize), and
    * per-round cuts also bound executor lineage at 50-round depth. */
  val checkpointEvery = 1
  private val Q = "1000000000000.0" // 1e-12 contribution quantum

  /** Distinct directed co-purchase edges (both directions) between
    * parts sharing an order. */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" =!= $"b.l_partkey")
      .select($"a.l_partkey".as("src"), $"b.l_partkey".as("dst"))
      .distinct()
  }

  /** §2.12 #53 — PageRank over the part co-purchase graph, fixed
    * [[pagerankIters]] rounds, damping [[damping]]. The graph is
    * symmetric by construction (every edge has its reverse), so there
    * are no dangling vertices and total rank mass stays 1. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = edges(s, dir).localCheckpoint(true)
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
    val n = deg.count() // one scalar to the driver: the vertex count
    // state carries outdeg so each round's quantized contribution
    // rank/outdeg is computed on the NODE-sized frame — the only
    // edge-scale work per round is one equi-join plus the partial-
    // aggregated mass sum (the two-edge-join formulation measured
    // 5.7 s at sf0.1; this shape 40% less)
    var state = deg.select($"src".as("id"), $"outdeg",
        (lit(1.0) / lit(n.toDouble)).as("rank"))
      .localCheckpoint(true)
    // lineage cut every [[checkpointEvery]] rounds (see its note —
    // measured: uncut chains re-plan the growing DAG and run 3×
    // slower; the dominant cost of this operator is the one-time
    // edge build, ~6 of 9 s at sf0.1, amortized in any real deploy
    // where the edge table is a persisted artifact).
    for (k <- 1 to pagerankIters) {
      val contribs = state.select($"id",
        expr(s"CAST(floor(rank / outdeg * $Q + CAST(0.5 AS DOUBLE)) AS BIGINT)").as("cq"))
      val sums = e.join(contribs, e("src") === contribs("id"))
        .groupBy($"dst").agg(sum($"cq").as("sq"))
      state = deg.join(sums, deg("src") === sums("dst"))
        .select($"src".as("id"), $"outdeg",
          (lit(1.0 - damping) / lit(n.toDouble) +
            lit(damping) * ($"sq".cast("double") / expr(s"CAST($Q AS DOUBLE)"))).as("rank"))
      if (k % checkpointEvery == 0 && k < pagerankIters)
        state = state.localCheckpoint(true)
    }
    state.select($"id".as("part_id"), $"rank").orderBy($"part_id")
  }

  val graphPagerankSql: String = {
    val base =
      s"""WITH e AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         |), d AS (
         |  SELECT src, count(*) AS outdeg FROM e GROUP BY src
         |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d
         |), r0 AS (
         |  SELECT d.src AS id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM d, nn
         |)""".stripMargin
    val iters = (1 to pagerankIters).map { k =>
      s"""r$k AS (
         |  SELECT e.dst AS id,
         |    CAST(${1.0 - damping} AS DOUBLE) / nn.n + CAST($damping AS DOUBLE) *
         |      (CAST(sum(CAST(floor(r.rank / d.outdeg * $Q + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
         |       / CAST($Q AS DOUBLE)) AS rank
         |  FROM e JOIN r${k - 1} r ON e.src = r.id JOIN d ON d.src = e.src, nn
         |  GROUP BY e.dst, nn.n
         |)""".stripMargin
    }
    (base +: iters).mkString(",\n") +
      s"\nSELECT id AS part_id, rank FROM r$pagerankIters ORDER BY part_id"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _)
  )

  def oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql
  )
}
