package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Agg.rndSql
import graft.functions.VectorFns
import graft.sources.Tables

/** §2.4 Deduplication suite over `documents` (+ `embeddings`).
  *
  * Scale layout (SURVEY §5): signatures (MinHash, SimHash, hyperplane
  * LSH) are computed row-local in one codegen'd pass — no shuffle.
  * Candidate generation shuffles only (band, bucket) keys and pairs up
  * within buckets, the standard LSH near-dup pipeline; nothing ever
  * does a global cross join — [[dedupEmbedding]] included (its
  * all-pairs ground truth lives only in DedupSpec + the DuckDB
  * oracle). The shingle-Jaccard variant IS quadratic per shingle
  * bucket — it exists as the oracle-checkable ground truth; the
  * 100 TB path is [[dedupMinhash]].
  */
object Dedup {

  /** Jaccard threshold for the exact n-gram variant. */
  val jaccardTau = 0.6
  /** Document-frequency cap for [[dedupNgramJaccard]]: shingles that
    * appear in more than this many documents are dropped before the
    * self-join. One viral boilerplate 3-gram across a crawl otherwise
    * turns its bucket quadratic (df² pairs); the cap bounds any bucket
    * at C(cap, 2). Semantics shift only for degenerate shingles — a
    * shared 3-gram in >cap docs carries no near-dup signal — and the
    * oracle mirrors the cap. Max observed df on test data is 25, so
    * results are unchanged there. */
  val shingleDfCap = 128
  /** Embedding near-dup cosine threshold. */
  val cosineTau = 0.4
  /** MinHash signature length and LSH banding (8 bands × 8 rows). */
  val minhashK = 64
  val bands = 8
  val rowsPerBand = 8

  private val toksExpr = "split(trim(text), '\\\\s+')"
  private val duckToks = "string_split_regex(trim(text), '\\s+')"

  /** doc_id + distinct word-3-gram shingles via the native
    * [[graft.functions.WordShingles]] expression (docs shorter than 3
    * tokens are excluded — they have no 3-gram identity). */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .filter(size($"toks") >= 3)
      .withColumn("shingles", expr("graft_shingles(toks)"))
      .select($"doc_id", $"shingles")
  }

  private val shingledSql: String =
    s"""SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
       |  FROM (SELECT doc_id, $duckToks AS toks FROM documents)
       |  WHERE len(toks) >= 3""".stripMargin

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * canonical. One shuffle on the hash — the 100 TB exact-dedup
    * layout (hash is uniform → no skew). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5($"text".cast("binary")).as("text_hash"))
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy($"canonical_id")
  }

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin

  /** Ground-truth near-dup pairs: word-3-gram Jaccard ≥ τ over the
    * df-capped shingle space (explode → df window → equi-self-join on
    * the shingle). The df window hash-partitions the exploded corpus
    * on the shingle, and the self-join reuses that exact partitioning
    * (ReusedExchange — one shuffle of the exploded corpus, not two).
    * Per-doc sizes are recomputed post-cap and joined onto the pair
    * set, which is tiny next to the exploded corpus. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    dedupNgramJaccard(s, dir, shingleDfCap)

  def dedupNgramJaccard(s: SparkSession, dir: String, dfCap: Int): DataFrame = {
    import s.implicits._
    val ex = shingled(s, dir).select($"doc_id", explode($"shingles").as("s"))
    val capped = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"s")))
      .filter($"df" <= dfCap).drop("df")
    val sizes = capped.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    // shuffle-hash, never broadcast: the exploded corpus is the BIG
    // side at scale — AQE would happily broadcast it at test SF and
    // that plan dies at 100 TB
    val pairs = capped.as("a").hint("shuffle_hash").join(capped.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc1"), $"b.doc_id".as("doc2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select($"doc_id".as("doc1"), $"n_sh".as("n1")), "doc1")
      .join(sizes.select($"doc_id".as("doc2"), $"n_sh".as("n2")), "doc2")
      .withColumn("jaccard",
        expr(rndSql("CAST(inter AS DOUBLE) / (n1 + n2 - inter)", 6)))
      .filter($"jaccard" >= jaccardTau)
      .select($"doc1", $"doc2", $"inter", $"jaccard")
      .orderBy($"doc1", $"doc2")
  }

  val dedupNgramJaccardSql: String =
    s"""WITH sh AS (
       |  $shingledSql),
       |e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |capped AS (
       |  SELECT doc_id, s FROM (
       |    SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM e)
       |  WHERE df <= $shingleDfCap),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM capped GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
       |  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc1, doc2, inter,
       |  ${rndSql("CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter)", 6)} AS jaccard
       |FROM pairs
       |JOIN sz s1 ON doc1 = s1.doc_id
       |JOIN sz s2 ON doc2 = s2.doc_id
       |WHERE ${rndSql("CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter)", 6)} >= $jaccardTau
       |ORDER BY doc1, doc2""".stripMargin

  /** doc_id + MinHash signature (k=[[minhashK]]) via the native
    * single-pass [[graft.functions.MinHashSig]] expression. */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shingled(s, dir)
      .withColumn("sig", expr("graft_minhash64(shingles)"))
      .select($"doc_id", $"sig")
  }

  /** MinHash + LSH banding candidate pairs with the signature-
    * estimated Jaccard. Shuffles only (band, bucket-hash) keys. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = minhashSignatures(s, dir)
    val banded = sigs.select($"doc_id", $"sig",
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("a").hint("shuffle_hash").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc1"), $"b.doc_id".as("doc2"),
        $"a.sig".as("sig1"), $"b.sig".as("sig2"))
      // dedupe multi-band hits on the id pair only — hashing the two
      // 64-long signatures per row through the distinct shuffle would
      // triple the exchanged bytes for no semantic gain
      .dropDuplicates("doc1", "doc2")
    cand
      .withColumn("est_jaccard",
        expr(rndSql(s"CAST(size(filter(zip_with(sig1, sig2, (x, y) -> x = y), m -> m)) AS DOUBLE) / $minhashK", 4)))
      .select($"doc1", $"doc2", $"est_jaccard")
      .orderBy($"doc1", $"doc2")
  }

  /** doc_id + 64-bit SimHash over tokens (term-frequency weighted by
    * construction: repeated tokens vote repeatedly) via the native
    * [[graft.functions.SimHash64]] expression. */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .withColumn("simhash", expr("graft_simhash64(toks)"))
      .select($"doc_id", $"simhash")
  }

  /** SimHash near-dup pairs: Hamming ≤ 3 via 4×16-bit band buckets
    * (pigeonhole: any pair within distance 3 shares a clean band). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = simhashSignatures(s, dir)
    val banded = sigs.select($"doc_id", $"simhash",
        posexplode(expr("transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535L)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").hint("shuffle_hash").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc1"), $"b.doc_id".as("doc2"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).cast("long").as("hamming"))
      // filter BEFORE the distinct so far-apart band collisions never
      // enter the dedup shuffle
      .filter($"hamming" <= 3)
      .dropDuplicates("doc1", "doc2")
      .orderBy($"doc1", $"doc2")
  }

  /** LSH banding for embedding near-dup: τ=0.4 (θ≈1.16 rad) gives a
    * per-hyperplane agreement p = 1-θ/π ≈ 0.63, so the band size must
    * stay small and the table count high for the banding to capture
    * every threshold pair: miss ≈ (1-p^B)^L ≈ 1e-6 per pair at B=3,
    * L=48. Recall is exactly 1.0 on all three test SFs (deterministic
    * hash-seeded planes). Denser corpora tune B up; these are the
    * τ-and-density knobs, not magic numbers. */
  val dedupLshTables = 48
  val dedupLshBits = 3

  /** Embedding near-dup: exact cosine ≥ τ pairs, LSH-bucketed.
    * Candidates come from [[Similarity.lshBuckets]] banding — only
    * vectors sharing a (table, bucket) pair up, ids-only through the
    * banding shuffle — then an exact cosine re-rank over the candidate
    * ids. No stage is all-pairs: the plan is equi-joins end to end
    * (PlanSpec asserts no BroadcastNestedLoopJoin/CartesianProduct).
    * Ground truth = [[dedupEmbeddingAllPairs]]; DedupSpec asserts
    * exact equality at spec SF, and the DuckDB oracle is the all-pairs
    * formulation at every driver SF. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = Similarity.lshBuckets(s, dir, dedupLshTables, dedupLshBits)
      .select($"vec_id", $"tbl", $"bucket")
    // shuffle-hash, never broadcast: both sides are the full corpus
    val cand = b.as("a").hint("shuffle_hash").join(b.as("b"),
        $"a.tbl" === $"b.tbl" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id1"), $"b.vec_id".as("id2"))
      // multi-table hits dedupe on the id pair alone — vectors join
      // back after, so no 64-wide array rides the distinct shuffle
      .dropDuplicates("id1", "id2")
    val v = Tables.embeddings(s, dir)
      .select($"vec_id", expr(VectorFns.asDouble("embedding")).as("v"))
      .withColumn("nrm", expr(VectorFns.norm("v")))
    cand
      .join(v.as("va"), $"id1" === $"va.vec_id")
      .join(v.as("vb"), $"id2" === $"vb.vec_id")
      .withColumn("cosine",
        expr(rndSql(s"${VectorFns.dot("va.v", "vb.v")} / (va.nrm * vb.nrm)", 6)))
      .filter($"cosine" >= cosineTau)
      .select($"id1", $"id2", $"cosine")
      .orderBy($"id1", $"id2")
  }

  /** All-pairs ground truth for [[dedupEmbedding]] — O(n²), spec-only
    * (never registered as a query; it is the small-SF yardstick the
    * bucketed pipeline is proven against). */
  private[graft] def dedupEmbeddingAllPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Tables.embeddings(s, dir)
      .select($"vec_id", expr(VectorFns.asDouble("embedding")).as("v"))
      .withColumn("nrm", expr(VectorFns.norm("v")))
    v.as("a").join(v.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("cosine",
        expr(rndSql(s"${VectorFns.dot("a.v", "b.v")} / (a.nrm * b.nrm)", 6)))
      .filter($"cosine" >= cosineTau)
      .select($"a.vec_id".as("id1"), $"b.vec_id".as("id2"), $"cosine")
      .orderBy($"id1", $"id2")
  }

  val dedupEmbeddingSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM v)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  ${rndSql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)", 6)} AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ${rndSql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)", 6)} >= $cosineTau
       |ORDER BY id1, id2""".stripMargin

  /** Per-source corpus sketches via the mergeable MinHash-union
    * aggregate, plus the estimated pairwise source overlap — the
    * "how much do these two crawls duplicate each other" question
    * answered from k longs per source instead of a corpus join. */
  def dedupSourceSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.udf.register("graft_minhash_union",
      org.apache.spark.sql.functions.udaf(graft.functions.MinHashUnion))
    val sigs = Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .filter(size($"toks") >= 3)
      .withColumn("sig", expr("graft_minhash64(graft_shingles(toks))"))
      .select($"source", $"sig")
    val sketches = sigs.groupBy($"source")
      .agg(expr("graft_minhash_union(sig)").as("sketch"),
           count(lit(1)).as("n_docs"))
    sketches.as("a").join(sketches.as("b"), $"a.source" < $"b.source")
      .select($"a.source".as("source1"), $"b.source".as("source2"),
        $"a.n_docs".as("n_docs1"), $"b.n_docs".as("n_docs2"),
        expr(rndSql(s"CAST(size(filter(zip_with(a.sketch, b.sketch, (x, y) -> x = y), m -> m)) AS DOUBLE) / $minhashK", 4))
          .as("est_overlap"))
      .orderBy($"source1", $"source2")
  }

  // -------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_source_sketch" -> (dedupSourceSketch _),
    "dedup_exact"         -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash"       -> (dedupMinhash _),
    "dedup_simhash"       -> (dedupSimhash _),
    "dedup_embedding"     -> (dedupEmbedding _)
  )

  /** minhash/simhash are hash-function-specific → rows-only check +
    * ScalaTest semantics (SURVEY §2.4). */
  def oracles: Map[String, String] = Map(
    "dedup_exact"         -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_embedding"     -> dedupEmbeddingSql
  )
}
