package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.5/§2.6 bridge — HYBRID retrieval: lexical BM25 and the IVF
  * vector index fused by Reciprocal Rank Fusion (Cormack et al. 2009,
  * the production default for combining keyword and embedding
  * retrieval — what a RAG-ish training-data curation pass runs to
  * find "documents like this one" when neither modality alone is
  * trustworthy). The documents and embeddings tables share one id
  * space (vec_id ≡ doc_id), so the SAME query document drives both
  * sides: its distinct terms are the BM25 more-like-this query, its
  * embedding is the ANN query.
  *
  * RRF score = Σ_lists 1/([[rrfK]] + rank), summed over the lists
  * that returned the document — rank-only fusion, so the two sides'
  * incomparable score scales never need calibration (the reason RRF
  * beats score interpolation in practice).
  *
  * Scale layout (the repo's parquet-backed-join-side rule, TESTS.md
  * round 11): the text side probes a PERSISTED bucketed BM25
  * postings index — each (term, doc) posting stores its FULL BM25
  * weight, precomputable because tf, dl, df, avgdl and N are all
  * corpus statistics with no query dependence — so a query pays a
  * broadcast term join + one bounded partial-agg shuffle, never the
  * corpus tokenize/df/avgdl aggregates the index build amortizes
  * (the [[TextAnalysis.buildPostingsIndex]] pattern, with the BM25
  * saturation baked in instead of tf·idf). Both join sides are
  * parquet-backed, so the planner sizes them from real stats — no
  * live corpus aggregate ever feeds a join it must size. The vector
  * side is the REGISTERED [[SimilarityIvf.annIvf]] tier through the
  * TierMemo rules (the corpus is probed, never shuffled); fusion
  * joins two ≤ queries×k rank lists — driver-scale. Cross-engine
  * exactness: the stored weight is the identical rnd(idf·saturation)
  * double the round-10 live chain computed (row-local, join-order
  * independent); the RRF reciprocals are deterministic IEEE
  * divisions written identically on both engines, summed in fixed
  * textual order, quantized at 1e-6 — the oracle is unchanged. */
object HybridSearch {

  /** The standard RRF dampening constant. */
  val rrfK = 60
  /** Fused results per query (also the per-side list depth for the
    * text side; the vector side contributes its own top-k). */
  val hybridK = 10

  val bm25IndexTable = "graft_bm25_postings_idx"
  val bm25IndexBuckets = 16

  /** Build the persisted BM25 postings index: one (term, doc_id, w)
    * row per posting, w = the exact 1e-6-quantized BM25 weight
    * idf·(tf·(k1+1))/(tf + k1·(1−b + b·dl/avgdl)). Bucketed by term
    * so term-probe joins read it exchange-free; built once per
    * (session, dataset) via [[graft.sources.Sinks.writeBucketedOnce]]
    * — the production shape where the index is written on ingest
    * cadence and queries only read it. */
  def buildBm25Index(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    import graft.functions.Agg.rnd
    import graft.operators.{TextAnalysis => TA}
    val k1p1 = TA.bm25K1 + 1.0
    val oneMinusB = 1.0 - TA.bm25B
    graft.sources.Sinks.writeBucketedOnce(dir, bm25IndexTable,
        Seq("term"), bm25IndexBuckets) {
      val tf = Tables.documents(s, dir)
        .select($"doc_id", explode(expr(TA.toksExpr)).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
      val stats = dl.agg(sum($"dl").as("tot")).crossJoin(broadcast(n))
        .select(($"tot".cast("double") / $"n".cast("double")).as("avgdl"), $"n")
      val idf = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .select($"term",
          rnd(log(lit(1.0) + ($"n" - $"df" + lit(0.5)) / ($"df" + lit(0.5))), 6)
            .as("idf"),
          $"avgdl")
      tf.join(dl, "doc_id").join(idf, "term")
        .select($"term", $"doc_id",
          rnd($"idf" * (($"tf" * lit(k1p1)) /
            ($"tf" + lit(TA.bm25K1) * (lit(oneMinusB) +
              lit(TA.bm25B) * ($"dl".cast("double") / $"avgdl")))), 6).as("w"))
    }
  }

  /** The text-side score frame, probing the persisted index: the
    * bounded query-doc term set (itself a pruned read of the index)
    * broadcasts onto the bucketed postings scan — the postings side
    * never reshuffles, never re-derives a corpus statistic — and the
    * matched rows take one (query, doc) partial-agg shuffle.
    * `private[graft]` so PlanSpec pins the exchange-free shape. */
  private[graft] def bm25Tscores(s: SparkSession, dir: String,
                                 keep: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    import graft.functions.Agg.dsum
    buildBm25Index(s, dir)
    val post = s.table(bm25IndexTable)
    // the more-like-this query: each query doc's DISTINCT terms,
    // read back from the index (a posting row exists exactly once
    // per (term, doc), so this IS the distinct term set)
    val q = broadcast(post.filter($"doc_id" < Similarity.nQueries)
      .select($"doc_id".as("query_id"), $"term"))
    val matched = post.join(q, "term")
      .filter($"doc_id" =!= $"query_id")
    // the metadata gate rides INTO the probe (filtered variant):
    // candidates outside the slice never reach the score agg
    keep.fold(matched)(kd => matched.join(kd, "doc_id"))
      .groupBy($"query_id", $"doc_id")
      .agg(dsum($"w").as("score"))
  }

  /** Rank-only RRF fusion of the two sides' rank lists (both
    * ≤ queries×k — driver-scale), shared by the unfiltered and
    * filtered variants. */
  private def fuse(s: SparkSession, tranks: DataFrame, vranks: DataFrame): DataFrame = {
    import s.implicits._
    val rrfExpr = graft.functions.Agg.rndSql(
      s"""coalesce(CAST(1 AS DOUBLE) / CAST($rrfK + text_rank AS DOUBLE), CAST(0 AS DOUBLE))
         | + coalesce(CAST(1 AS DOUBLE) / CAST($rrfK + vec_rank AS DOUBLE), CAST(0 AS DOUBLE))"""
        .stripMargin, 6)
    tranks.join(vranks, Seq("query_id", "doc_id"), "full")
      .withColumn("rrf", expr(rrfExpr))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id").orderBy($"rrf".desc, $"doc_id")).cast("long"))
      .filter($"rank" <= hybridK)
      .select($"query_id", $"rank", $"doc_id", $"rrf", $"text_rank", $"vec_rank")
      .orderBy($"query_id", $"rank")
  }

  private def textRanks(s: SparkSession, tscores: DataFrame): DataFrame = {
    import s.implicits._
    graft.plans.TopK.perGroup(tscores, Seq("query_id"),
        Seq("score" -> true, "doc_id" -> false), hybridK)
      .select($"query_id", $"doc_id", $"rank".as("text_rank"))
  }

  def searchHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tranks = textRanks(s, bm25Tscores(s, dir))
    val vranks = graft.sources.TierMemo.cached("ann_ivf", dir, s)(
        SimilarityIvf.annIvf(s, dir))
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rank".as("vec_rank"))
    fuse(s, tranks, vranks)
  }

  /** The language predicate of [[searchHybridFiltered]] — stands in
    * for the license/source/date filter every production retrieval
    * pass carries. */
  val hybridFilterLang = "zh"

  /** §2.5/§2.6 — FILTERED hybrid retrieval: 31ad's fusion with a
    * metadata predicate (documents.lang) riding into BOTH sides —
    * the full production RAG shape ("documents like this one, but
    * only <language/license>"), composing the round's two mechanisms:
    * the text side probes the persisted BM25 postings index with the
    * slice join BEFORE the score agg (candidates outside the slice
    * never reach a shuffle), and the vector side is the
    * filter-aware IVF probe with the per-query starved-list
    * brute-force fallback within the slice ([[SimilarityIvf
    * .annFilteredOn]] — post-filtering either side's unfiltered
    * top-k would silently under-recall, AnnFilteredSpec's
    * construction). BM25 weights stay the full-corpus statistics
    * (the index is slice-agnostic — one artifact serves every
    * predicate); only candidate admission filters. Queries
    * themselves are NOT filtered: "neighbors of this document within
    * the slice" is well-posed for any query document. */
  def searchHybridFiltered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keep = Tables.documents(s, dir)
      .filter($"lang" === lit(hybridFilterLang)).select($"doc_id")
    val tranks = textRanks(s, bm25Tscores(s, dir, Some(keep)))
    val vranks = SimilarityIvf.annFilteredOn(s, dir,
        keep.select($"doc_id".as("vec_id")))
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rank".as("vec_rank"))
    fuse(s, tranks, vranks)
  }

  /** Oracle: the 35l BM25 CTE chain with the query-doc term set, the
    * staged-centroid IVF tier (31b's oracle verbatim as a subquery),
    * and the fusion replayed term-for-term. */
  def searchHybridRrfSql(centGlob: String): String =
    hybridSqlOf(
      vranksSub = s"SELECT query_id, neighbor_id AS doc_id, rank AS vec_rank\n" +
        s"  FROM (${SimilarityIvf.annIvfSql(centGlob)})",
      keepCte = "", keepJoin = "")

  /** Oracle for the FILTERED variant: the same chain with the
    * language slice admitted into the weighted candidates, and the
    * filtered-probe oracle (31ae's, with the documents-lang filt
    * body) as the vector subquery. */
  def searchHybridFilteredSql(centGlob: String): String =
    hybridSqlOf(
      vranksSub = s"SELECT query_id, neighbor_id AS doc_id, rank AS vec_rank\n" +
        s"  FROM (${SimilarityIvf.annFilteredSqlOf(centGlob,
          s"""SELECT a.vec_id, a.cid
             |  FROM assigned a JOIN documents d ON d.doc_id = a.vec_id
             |  WHERE d.lang = '$hybridFilterLang'""".stripMargin)})",
      keepCte =
        s"keep AS (SELECT doc_id FROM documents WHERE lang = '$hybridFilterLang'),\n",
      keepJoin = " JOIN keep ON keep.doc_id = tf.doc_id")

  private def hybridSqlOf(vranksSub: String, keepCte: String,
                          keepJoin: String): String = {
    import graft.functions.Agg.{dsumSql, rndSql}
    import graft.operators.{TextAnalysis => TA}
    val k1p1 = TA.bm25K1 + 1.0
    val oneMinusB = 1.0 - TA.bm25B
    s"""WITH tf AS (
       |  SELECT doc_id, t AS term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${TA.duckToks}) AS t FROM documents)
       |  GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |stats AS (
       |  SELECT (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) /
       |         (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl,
       |         (SELECT count(*) FROM documents) AS n),
       |idf AS (
       |  SELECT term,
       |    ${rndSql("ln(1.0 + (n - df + 0.5) / (df + 0.5))", 6)} AS idf,
       |    avgdl
       |  FROM (SELECT term, count(*) AS df FROM tf GROUP BY 1), stats),
       |q AS (
       |  SELECT DISTINCT doc_id AS query_id, term FROM tf
       |  WHERE doc_id < ${Similarity.nQueries}),
       |${keepCte}weighted AS (
       |  SELECT q.query_id, tf.doc_id,
       |    ${rndSql(s"idf.idf * ((tf.tf * $k1p1) / (tf.tf + ${TA.bm25K1} * " +
                     s"($oneMinusB + ${TA.bm25B} * (CAST(dl.dl AS DOUBLE) / idf.avgdl))))", 6)} AS w
       |  FROM tf JOIN dl USING (doc_id) JOIN q USING (term)
       |    JOIN idf USING (term)$keepJoin
       |  WHERE tf.doc_id <> q.query_id),
       |tscores AS (
       |  SELECT query_id, doc_id, ${dsumSql("w")} AS score
       |  FROM weighted GROUP BY 1, 2),
       |tranks AS (
       |  SELECT query_id, doc_id, rank AS text_rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, doc_id) AS rank
       |    FROM tscores)
       |  WHERE rank <= $hybridK),
       |vranks AS (
       |  $vranksSub),
       |fused AS (
       |  SELECT coalesce(t.query_id, v.query_id) AS query_id,
       |         coalesce(t.doc_id, v.doc_id) AS doc_id,
       |         t.text_rank, v.vec_rank,
       |    ${rndSql(s"coalesce(CAST(1 AS DOUBLE) / CAST($rrfK + t.text_rank AS DOUBLE), CAST(0 AS DOUBLE)) " +
                     s"+ coalesce(CAST(1 AS DOUBLE) / CAST($rrfK + v.vec_rank AS DOUBLE), CAST(0 AS DOUBLE))", 6)} AS rrf
       |  FROM tranks t FULL JOIN vranks v
       |    ON t.query_id = v.query_id AND t.doc_id = v.doc_id)
       |SELECT query_id, rank, doc_id, rrf, text_rank, vec_rank FROM (
       |  SELECT query_id, doc_id, rrf, text_rank, vec_rank,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY rrf DESC, doc_id) AS rank
       |  FROM fused)
       |WHERE rank <= $hybridK
       |ORDER BY query_id, rank""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_hybrid_rrf" -> (searchHybridRrf _),
    "search_hybrid_filtered" -> (searchHybridFiltered _)
  )

  def oracles: Map[String, String] =
    graft.sources.OracleStage.globOf("ivf_centroids").toSeq.flatMap(g => Seq(
      "search_hybrid_rrf" -> searchHybridRrfSql(g),
      "search_hybrid_filtered" -> searchHybridFilteredSql(g))).toMap
}
