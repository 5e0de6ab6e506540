package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Agg.rndSql
import graft.functions.VectorFns
import graft.sources.Tables

/** §2.5 Similarity search over the `embeddings` table.
  *
  * [[annBruteforce]] is the exact baseline: query-set × corpus cosine
  * with a per-query top-k window. The join is bounded by |Q| — with a
  * small query set it is a broadcast of Q against a full corpus scan,
  * which IS the scalable exact layout (linear in corpus size, no
  * corpus self-join).
  *
  * [[annLsh]] is the scale path: deterministic random-hyperplane
  * (Rademacher ±1, hash-seeded) signatures — L tables × B bits,
  * row-local — then candidates only where query and corpus vector
  * share a bucket, exact cosine re-rank on candidates. Shuffles
  * (table, bucket) keys only; recall vs. the brute-force baseline is
  * asserted in SimilaritySpec.
  */
object Similarity {

  /** Top-k neighbors returned per query. */
  val k = 5
  /** Queries = the first [[nQueries]] vec_ids (deterministic set). */
  val nQueries = 10
  /** LSH: [[lshTables]] hash tables × [[lshBits]] hyperplane bits. */
  val lshTables = 8
  val lshBits = 6

  private def vectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", expr(VectorFns.asDouble("embedding")).as("v"))
      .withColumn("nrm", expr(VectorFns.norm("v")))
  }

  /** Exact cosine top-k for the query set. */
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val q = v.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val scored = v.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("cosine",
        expr(rndSql(s"${VectorFns.dot("qv", "v")} / (qnrm * nrm)", 6)))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val annBruteforceSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM v),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${rndSql("list_dot_product(q.v, c.v) / (q.nrm * c.nrm)", 6)} AS cosine
       |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries)
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank,
       |  neighbor_id, cosine
       |FROM scored
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Hyperplane component for (plane p, dim d): hash-seeded ±1 —
    * fully deterministic, the same value as SQL `xxhash64(p, d)`
    * (computed once on the driver and shipped as a literal matrix
    * instead of 48×64 hash evals per row). */
  private[operators] def plane(p: Int, d: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(p), Literal(d)), 42L).eval(null).asInstanceOf[Long]
    (((h % 2) + 2) % 2) * 2.0 - 1.0
  }

  /** vec_id + one bucket id per LSH table. `tables`×`bits` default to
    * the top-k ANN tuning; [[Dedup.dedupEmbedding]] passes its own
    * (more tables, fewer bits) because a τ=0.4 threshold needs much
    * higher per-pair recall than a top-k search. */
  def lshBuckets(s: SparkSession, dir: String,
                 tables: Int = lshTables, bits: Int = lshBits): DataFrame = {
    import s.implicits._
    val nPlanes = tables * bits
    val dims = 64
    val planes = typedLit(Seq.tabulate(nPlanes, dims)((p, d) => plane(p, d + 1)))
    vectors(s, dir)
      .withColumn("planes", planes)
      .withColumn("bits",
        expr("transform(planes, pl -> CASE WHEN graft_dot(v, pl) >= 0D THEN 1L ELSE 0L END)"))
      .drop("planes")
      .select($"vec_id", $"v", $"nrm",
        posexplode(expr(
          s"""transform(sequence(0, ${tables - 1}), t ->
             |  aggregate(sequence(0, ${bits - 1}), 0L,
             |    (acc, j) -> acc + shiftleft(element_at(bits, t * $bits + j + 1), j)))""".stripMargin)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
  }

  /** Bucketed ANN: candidates share an LSH bucket with the query in
    * at least one table; exact cosine re-rank, top-k. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = lshBuckets(s, dir)
    // stage the bucket assignment (ids only — the vectors stay in the
    // frame) so the oracle can recompute candidate generation and the
    // exact re-rank from it; the write is memoized per dataset
    graft.sources.OracleStage.stage(s, "lsh_buckets", dir)(
      b.select($"vec_id", $"tbl", $"bucket"))
    val qb = b.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        $"tbl", $"bucket")
    val cand = b.join(broadcast(qb),
        b("tbl") === qb("tbl") && b("bucket") === qb("bucket") &&
          b("vec_id") =!= qb("query_id"))
      .select($"query_id", $"qv", $"qnrm", $"vec_id", $"v", $"nrm")
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    cand
      .withColumn("cosine",
        expr(rndSql(s"${VectorFns.dot("qv", "v")} / (qnrm * nrm)", 6)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** Oracle over the STAGED bucket table: candidate generation,
    * exact-cosine re-rank and top-k recomputed in DuckDB — everything
    * downstream of the hyperplane signs is hash-checked (the plane
    * hashing itself is covered by the recall spec + determinism). */
  def annLshSql(glob: String): String =
    s"""WITH b AS (SELECT vec_id, tbl, bucket FROM read_parquet('$glob')),
       |v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM v),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM b q JOIN b c
       |    ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${rndSql("list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm)", 6)} AS cosine
       |  FROM cand JOIN n qn ON qn.vec_id = cand.query_id
       |            JOIN n cn ON cn.vec_id = cand.neighbor_id)
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank,
       |  neighbor_id, cosine
       |FROM scored
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Matryoshka prefix dimensionality and shortlist multiplier. */
  val mrlDims = 16
  val mrlFactor = 4

  /** §2.5 — matryoshka (truncated-dimension) ANN: shortlist by
    * cosine over the first [[mrlDims]] of 64 dims, exact full-dim
    * re-rank of the k×[[mrlFactor]] survivors. The MRL serving
    * pattern (Kusupati et al., NeurIPS'22 — embeddings trained so
    * prefixes are themselves embeddings): the shortlist pass reads ¼
    * of the vector bytes and does ¼ of the multiply-adds, and —
    * unlike IVF/PQ — needs no trained index artifact, so it applies
    * to a corpus version the clusterer hasn't seen yet. Both stages
    * are deterministic (1e-6-quantized scores, id tiebreak) and
    * SQL-expressible, so the row is hash-oracled end to end, unlike
    * the recall-spec'd LSH/IVF rows. Scale layout: stage 1 is the
    * brute-force scan shape on the SLICED column (broadcast query
    * side, corpus never shuffles; the scan's column pruning is
    * Catalyst's, the byte cut is the slice) feeding the bounded-heap
    * top-k' ([[graft.plans.TopK.perGroup]] — ≤k' rows per partition
    * per query ship, no per-query global sort); stage 2 re-reads
    * full vectors for shortlist ids only (equi-join) and re-ranks on
    * a k'-bounded frame. */
  def annMatryoshka(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vectors(s, dir)
    val pv = v.select($"vec_id", expr(s"slice(v, 1, $mrlDims)").as("pv"))
      .withColumn("pnrm", expr(VectorFns.norm("pv")))
    val q = pv.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"pv".as("qpv"), $"pnrm".as("qpnrm"))
    val scored = pv.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("pcos",
        expr(rndSql(s"${VectorFns.dot("qpv", "pv")} / (qpnrm * pnrm)", 6)))
      .select($"query_id", $"vec_id", $"pcos")
    val shortlist = graft.plans.TopK.perGroup(scored, Seq("query_id"),
        Seq("pcos" -> true, "vec_id" -> false), k * mrlFactor)
      .select($"query_id", $"vec_id")
    val qf = v.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val rescored = shortlist
      .join(v, "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cosine",
        expr(rndSql(s"${VectorFns.dot("qv", "v")} / (qnrm * nrm)", 6)))
      .select($"query_id", $"vec_id", $"cosine")
    graft.plans.TopK.perGroup(rescored, Seq("query_id"),
        Seq("cosine" -> true, "vec_id" -> false), k)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val annMatryoshkaSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |    v[1:$mrlDims] AS pv,
       |    sqrt(list_sum(list_transform(v[1:$mrlDims], x -> x * x))) AS pnrm
       |  FROM v),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${rndSql("list_dot_product(q.pv, c.pv) / (q.pnrm * c.pnrm)", 6)} DESC,
       |        c.vec_id) AS prank
       |    FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < $nQueries)
       |  WHERE prank <= ${k * mrlFactor})
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank,
       |  neighbor_id, cosine
       |FROM (
       |  SELECT s.query_id, s.vec_id AS neighbor_id,
       |    ${rndSql("list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm)", 6)} AS cosine
       |  FROM short s JOIN n qn ON qn.vec_id = s.query_id
       |               JOIN n cn ON cn.vec_id = s.vec_id)
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (annBruteforce _),
    "ann_lsh"        -> (annLsh _),
    "ann_matryoshka" -> (annMatryoshka _)
  )

  def oracles: Map[String, String] =
    Map("ann_bruteforce" -> annBruteforceSql,
        "ann_matryoshka" -> annMatryoshkaSql) ++
      graft.sources.OracleStage.globOf("lsh_buckets")
        .map(g => "ann_lsh" -> annLshSql(g))
}
