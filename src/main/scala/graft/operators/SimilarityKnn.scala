package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Agg.rndSql
import graft.functions.VectorFns

/** §2.5 — NN-descent k-NN GRAPH construction: every corpus vector's
  * approximate top-k cosine neighbors, the graph-ANN tier next to
  * IVF/PQ/LSH/binary (and the substrate HNSW-style indexes and
  * graph-based semantic dedup build on). Wei Dong et al.'s NN-descent
  * observation: "a neighbor of a neighbor is likely a neighbor" —
  * start from cheap candidates and iterate local joins until the
  * graph converges.
  *
  * Scale layout — every stage is EDGE-bounded (n·k rows), never
  * corpus-quadratic:
  *  - Init: within each LSH bucket, each vector links to the next
  *    [[initFanout]] ids (a per-bucket window `lead`, row-bounded) —
  *    NOT a bucket self-join, whose pair count is quadratic in the
  *    bucket size; similar vectors share buckets, so the seed edges
  *    already point roughly the right way.
  *  - Round: undirect the current graph, propose co-neighbor pairs
  *    through each hub (≤ (2k)² per hub), score the proposals with
  *    two hash joins against the vector table, fold into the pool,
  *    re-take top-k. Shuffles carry (src, dst, cosine) triples only;
  *    vectors never ride a round's shuffle beyond the scoring joins.
  *  - The accumulated scored pool stages as the oracle artifact —
  *    top-k selection over it is plain relational work DuckDB
  *    replays; graph quality (recall vs exact, round-over-round
  *    convergence) is SimilarityKnnSpec's job, the
  *    trajectory-can't-be-SQL split used by the whole hash family.
  */
object SimilarityKnn {

  /** Neighbors kept per node (reported graph degree). */
  val knnK = 5
  /** NN-descent refinement rounds. */
  val knnRounds = 3
  /** Per-bucket forward links seeding the graph. */
  val initFanout = 3
  /** INTERNAL degree during descent — the standard NN-descent trick:
    * propagate through a denser working graph than you report
    * (near-random corpora have weak neighbor-of-neighbor
    * transitivity at degree 5; degree 10 propagation recovers it),
    * then emit the top-[[knnK]] of the final pool. */
  val searchK = 10

  private def cosine(qv: String, v: String, qn: String, n: String) =
    expr(rndSql(s"${VectorFns.dot(qv, v)} / ($qn * $n)", 6))

  /** Score (src, dst) id pairs with exact quantized cosine. */
  private def score(pairs: DataFrame, v: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs
      .join(v.select($"vec_id".as("src"), $"v".as("sv"), $"nrm".as("snrm")), "src")
      .join(v.select($"vec_id".as("dst"), $"v".as("dv"), $"nrm".as("dnrm")), "dst")
      .select($"src", $"dst", cosine("sv", "dv", "snrm", "dnrm").as("cosine"))
  }

  private def topK(pool: DataFrame, k: Int = knnK): DataFrame = {
    val s = pool.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"src").orderBy($"cosine".desc, $"dst")
    pool.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
  }

  /** The accumulated candidate pool (src, dst, cosine — every pair
    * the descent ever scored), staged once per dataset. */
  private[graft] def knnCandidatePool(s: SparkSession, dir: String): DataFrame =
    graft.sources.OracleStage.stage(s, "knn_candidates", dir)(
      poolOf(s, dir, knnRounds))

  /** The descent with an explicit round count (spec seam: rounds = 0
    * exposes the seed-only graph for convergence comparison). */
  private[graft] def poolOf(s: SparkSession, dir: String, rounds: Int): DataFrame =
    {
      import s.implicits._
      val v = Similarity.nonDegenerate(Similarity.vectors(s, dir))
        .localCheckpoint(true)
      val b = Similarity.lshBuckets(s, dir).select($"vec_id", $"tbl", $"bucket")
      val bw = Window.partitionBy($"tbl", $"bucket").orderBy($"vec_id")
      // lead-linked seeds: vec -> next j ids in its bucket
      val seeds = (1 to initFanout).map { j =>
        b.withColumn("dst", lead($"vec_id", j).over(bw))
          .filter($"dst".isNotNull)
          .select($"vec_id".as("src"), $"dst")
      }.reduce(_ unionByName _)
      val seedBoth = seeds.union(seeds.select($"dst".as("src"), $"src".as("dst")))
        .filter($"src" =!= $"dst").distinct()
      var pool = score(seedBoth, v).localCheckpoint(true)
      var g = topK(pool, searchK).select($"src", $"dst", $"cosine")
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val u = g.select($"src", $"dst")
          .union(g.select($"dst".as("src"), $"src".as("dst")))
          .distinct()
        val prop = u.as("x").join(u.as("y"), "src")
          .filter($"x.dst" < $"y.dst")
          .select($"x.dst".as("src"), $"y.dst".as("dst"))
          .distinct()
          // only pairs the pool hasn't scored yet pay the scoring joins
          .join(pool.select($"src", $"dst"), Seq("src", "dst"), "left_anti")
        val scored = score(prop, v)
        val both = scored
          .union(scored.select($"dst".as("src"), $"src".as("dst"), $"cosine"))
        pool = pool.union(both)
          .dropDuplicates("src", "dst")
          .localCheckpoint(true)
        g = topK(pool, searchK).select($"src", $"dst", $"cosine")
          .localCheckpoint(true)
      }
      pool
    }

  /** §2.5 — the k-NN graph: approximate top-[[knnK]] neighbors for
    * EVERY corpus vector (not just the query set), from the staged
    * NN-descent candidate pool. */
  def annKnnGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    topK(knnCandidatePool(s, dir))
      .select($"src".as("vec_id"), $"rank", $"dst".as("neighbor_id"), $"cosine")
      .orderBy($"vec_id", $"rank")
  }

  /** Oracle: top-k per node re-derived from the staged pool. */
  def annKnnGraphSql(glob: String): String =
    s"""SELECT vec_id, rank, neighbor_id, cosine FROM (
       |  SELECT src AS vec_id,
       |    row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rank,
       |    dst AS neighbor_id, cosine
       |  FROM '$glob')
       |WHERE rank <= $knnK
       |ORDER BY vec_id, rank""".stripMargin

  /** §2.5 — the INDEX-SELECTION report: recall@k of every ANN tier
    * against the exact brute-force truth on the shared query set, in
    * one table — the measurement an operator reads before choosing
    * which index to deploy (and the regression gate run after any
    * re-embedding: a tier's recall collapsing means its artifact went
    * stale). Each tier's result is the REGISTERED operator itself
    * re-invoked (staged artifacts make the re-runs cheap), so the
    * report can never drift from what the queries actually return;
    * the truth join and rollup are |methods|·queries·k-bounded. */
  def annRecallReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = Similarity.annBruteforce(s, dir)
      .select($"query_id", $"neighbor_id")
    val methods: Seq[(String, DataFrame)] = Seq(
      "ann_lsh" -> Similarity.annLsh(s, dir)
        .select($"query_id", $"neighbor_id"),
      "ann_matryoshka" -> Similarity.annMatryoshka(s, dir)
        .select($"query_id", $"neighbor_id"),
      "ann_hamming" -> Similarity.annHamming(s, dir)
        .select($"query_id", $"neighbor_id"),
      "ann_hamming_refine" -> Similarity.annHammingRefine(s, dir)
        .select($"query_id", $"neighbor_id"),
      "ann_knn_graph" -> annKnnGraph(s, dir)
        .filter($"vec_id" < Similarity.nQueries)
        .select($"vec_id".as("query_id"), $"neighbor_id"))
    val preds = methods.map { case (m, df) =>
      df.select(lit(m).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    val tc = truth.agg(count(lit(1)).as("t_n"))
    preds
      .join(truth.withColumn("hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy($"method")
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce($"hit", lit(0L))).as("n_hits"))
      .crossJoin(tc) // bounded: one scalar row
      .select($"method", $"n_returned", $"n_hits",
        expr(rndSql("CAST(n_hits AS DOUBLE) / CAST(t_n AS DOUBLE)", 6))
          .as("recall"))
      .orderBy($"method")
  }

  /** Oracle: every tier's own oracle SQL embedded as a subquery (CTEs
    * nest fine in DuckDB), unioned and scored against the brute-force
    * truth — so the report's oracle is exactly the composition of the
    * already-proven per-tier oracles. */
  def annRecallReportSql(lshGlob: String, knnGlob: String): String =
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (${Similarity.annBruteforceSql})),
       |preds AS (
       |  SELECT 'ann_lsh' AS method, query_id, neighbor_id
       |  FROM (${Similarity.annLshSql(lshGlob)})
       |  UNION ALL SELECT 'ann_matryoshka', query_id, neighbor_id
       |  FROM (${Similarity.annMatryoshkaSql})
       |  UNION ALL SELECT 'ann_hamming', query_id, neighbor_id
       |  FROM (${Similarity.annHammingSql})
       |  UNION ALL SELECT 'ann_hamming_refine', query_id, neighbor_id
       |  FROM (${Similarity.annHammingRefineSql})
       |  UNION ALL SELECT 'ann_knn_graph', vec_id, neighbor_id
       |  FROM (${annKnnGraphSql(knnGlob)})
       |  WHERE vec_id < ${Similarity.nQueries}),
       |tc AS (SELECT count(*) AS t_n FROM truth),
       |j AS (
       |  SELECT p.method,
       |    CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM preds p LEFT JOIN truth t
       |    ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id)
       |SELECT method, count(*) AS n_returned,
       |  CAST(sum(hit) AS BIGINT) AS n_hits,
       |  ${rndSql("CAST(sum(hit) AS DOUBLE) / CAST(max(t_n) AS DOUBLE)", 6)} AS recall
       |FROM j, tc
       |GROUP BY method
       |ORDER BY method""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_knn_graph" -> (annKnnGraph _),
    "ann_recall_report" -> (annRecallReport _)
  )

  def oracles: Map[String, String] =
    graft.sources.OracleStage.globOf("knn_candidates")
      .map(g => "ann_knn_graph" -> annKnnGraphSql(g)).toMap ++
      (for {
        lg <- graft.sources.OracleStage.globOf("lsh_buckets")
        kg <- graft.sources.OracleStage.globOf("knn_candidates")
      } yield "ann_recall_report" -> annRecallReportSql(lg, kg))
}
