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

  /** Beam width of the graph search (candidates expanded per round). */
  val beamWidth = 8
  /** Fixed descent rounds — the bounded-iteration contract of every
    * graph loop here (Graph.scala's BFS shape): each round costs one
    * frontier expansion, never "until converged" on a skewed graph. */
  val searchRounds = 4
  /** Entry points shared by every query: the [[Similarity
    * .knnEvalHashSql]]-ranked lowest ids — a deterministic pseudo-
    * random sample, the same device as the kNN-eval query sample. */
  val entryCount = 4

  /** The reported graph re-cut to the denser SEARCH degree
    * ([[searchK]]) — the adjacency the descent walks. Staged via the
    * same candidate pool, so search and graph share one artifact. */
  private def searchEdges(s: SparkSession, dir: String): DataFrame =
    topK(knnCandidatePool(s, dir), searchK)
      .select(col("src"), col("dst"))

  /** §2.5 — GRAPH-ANN SEARCH: greedy beam descent over the staged
    * NN-descent graph — the query path of an HNSW-class index (flat
    * variant: one layer, fixed entry points), completing the graph
    * tier that [[annKnnGraph]] builds: the graph answers "neighbors
    * of a corpus member", this answers "neighbors of a QUERY" by
    * walking edges instead of scanning the corpus.
    *
    * Per round: the per-query top-[[beamWidth]] of everything scored
    * so far expands one hop through the edge table, unseen candidates
    * are scored against the query vector, and the beam re-forms —
    * [[searchRounds]] bounded rounds, then top-[[Similarity.k]] of
    * the visited set (self excluded).
    *
    * Scale layout: the frontier is queries×beam rows and BROADCASTS
    * into the edge and vector tables, so the corpus and the n·k edge
    * artifact are only ever scanned, never shuffled — per-round cost
    * is |queries|·beam·degree scored rows. A production run with a
    * large query batch partitions the queries and runs batches
    * independently (queries never interact); the corpus-side plan is
    * unchanged. Visited sets localCheckpoint per round (lineage cut,
    * the loop contract of [[poolOf]]).
    *
    * The descent's top-k is STAGED once per dataset (the §5 artifact
    * rule): [[annRecallReport]] re-invokes every tier, and without
    * staging the report would re-pay the full multi-round descent —
    * measured at sf≈1 it was the report's single largest term
    * (+7.7 s). The oracle still re-derives the whole descent from
    * the staged candidate POOL, so staging the result changes what
    * is cached, not what is checked. */
  def annGraphSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.OracleStage.stage(s, "graph_search_topk", dir)(
        graphSearchOf(s, dir))
      .orderBy($"query_id", $"rank")
  }

  private def graphSearchOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Similarity.nonDegenerate(Similarity.vectors(s, dir))
      .localCheckpoint(true)
    val edges = searchEdges(s, dir).localCheckpoint(true)
    val q = v.filter($"vec_id" < Similarity.nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val entry = v.withColumn("h", expr(Similarity.knnEvalHashSql))
      .orderBy($"h", $"vec_id").limit(entryCount)
      .select($"vec_id".as("node"))
    val cv = v.select($"vec_id".as("node"), $"v".as("nv"), $"nrm".as("nn"))
    // (query_id, node) candidates -> scored cosine; candidates are
    // tiny (queries-bounded) and broadcast — the corpus never shuffles
    def scoreCands(cand: DataFrame): DataFrame =
      cv.join(broadcast(cand), "node")
        .join(broadcast(q), "query_id")
        .select($"query_id", $"node",
          cosine("qv", "nv", "qn", "nn").as("cosine"))
    val bw = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"node")
    var visited = scoreCands(q.select($"query_id").crossJoin(entry))
      .localCheckpoint(true)
    for (_ <- 1 to searchRounds) {
      val frontier = visited.withColumn("rk", row_number().over(bw))
        .filter($"rk" <= beamWidth).select($"query_id", $"node")
      val cand = edges.join(broadcast(frontier), $"src" === $"node")
        .select($"query_id", $"dst".as("node")).distinct()
        .join(visited.select($"query_id", $"node"),
          Seq("query_id", "node"), "left_anti")
      visited = visited.union(scoreCands(cand)).localCheckpoint(true)
    }
    visited.filter($"node" =!= $"query_id")
      .withColumn("rank", row_number().over(bw).cast("long"))
      .filter($"rank" <= Similarity.k)
      .select($"query_id", $"rank", $"node".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** Oracle: the descent unrolled round-by-round as CTEs over the
    * staged pool (the pagerank-family device — the loop is
    * deterministic, so fixed rounds are expressible as nested
    * relational algebra; DuckDB replays beam, expansion, anti-join
    * and re-beam exactly). */
  def annGraphSearchSql(glob: String): String = {
    val cos = rndSql("list_dot_product(q.qv, c.v) / (q.qn * c.nrm)", 6)
    val rounds = (1 to searchRounds).map { r =>
      s"""f${r - 1} AS (
         |  SELECT query_id, node FROM (
         |    SELECT query_id, node,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, node) AS rk
         |    FROM vis${r - 1}) WHERE rk <= $beamWidth),
         |x$r AS (
         |  SELECT DISTINCT f.query_id, e.dst AS node
         |  FROM f${r - 1} f JOIN e ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM vis${r - 1} w
         |    WHERE w.query_id = f.query_id AND w.node = e.dst)),
         |vis$r AS (
         |  SELECT * FROM vis${r - 1}
         |  UNION ALL
         |  SELECT x.query_id, x.node, $cos AS cosine
         |  FROM x$r x
         |  JOIN n c ON c.vec_id = x.node
         |  JOIN q ON q.query_id = x.query_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM v
       |  WHERE list_sum(list_transform(v, x -> x * x)) > 0),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
       |      WHERE vec_id < ${Similarity.nQueries}),
       |e AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
       |    FROM '$glob') WHERE rk <= $searchK),
       |entry AS (
       |  SELECT vec_id AS node FROM n
       |  ORDER BY ${Similarity.knnEvalHashSql}, vec_id LIMIT $entryCount),
       |vis0 AS (
       |  SELECT q.query_id, c.vec_id AS node, $cos AS cosine
       |  FROM q, entry JOIN n c ON c.vec_id = entry.node),
       |$rounds
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT query_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, node) AS rank,
       |    node AS neighbor_id, cosine
       |  FROM vis$searchRounds WHERE node <> query_id)
       |WHERE rank <= ${Similarity.k}
       |ORDER BY query_id, rank""".stripMargin
  }

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
        .select($"vec_id".as("query_id"), $"neighbor_id"),
      "ann_graph_search" -> annGraphSearch(s, dir)
        .select($"query_id", $"neighbor_id"))
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
       |  WHERE vec_id < ${Similarity.nQueries}
       |  UNION ALL SELECT 'ann_graph_search', query_id, neighbor_id
       |  FROM (${annGraphSearchSql(knnGlob)})),
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
    "ann_graph_search" -> (annGraphSearch _),
    "ann_recall_report" -> (annRecallReport _)
  )

  def oracles: Map[String, String] =
    graft.sources.OracleStage.globOf("knn_candidates")
      .map(g => "ann_knn_graph" -> annKnnGraphSql(g)).toMap ++
      graft.sources.OracleStage.globOf("knn_candidates")
        .map(g => "ann_graph_search" -> annGraphSearchSql(g)).toMap ++
      (for {
        lg <- graft.sources.OracleStage.globOf("lsh_buckets")
        kg <- graft.sources.OracleStage.globOf("knn_candidates")
      } yield "ann_recall_report" -> annRecallReportSql(lg, kg))
}
