package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Agg.{dsum, rndSql}
import graft.functions.VectorFns

/** §2.5 IVF (inverted-file) ANN — the second scale path next to
  * [[Similarity.annLsh]].
  *
  * Coarse quantizer: a small deterministic k-means run as DataFrame
  * ops. Assignment is row-local arithmetic against a broadcast
  * centroid literal; the update step aggregates per-(cluster, dim)
  * with the exact decimal sum, so centroids are IDENTICAL regardless
  * of partitioning — the property that makes the index reproducible
  * on a 1000-executor cluster. Only nlist × dim numbers ever reach
  * the driver per iteration.
  *
  * Search: a query probes its nprobe nearest lists; candidates are
  * the vectors assigned there (join on cid — at scale the corpus
  * assignment is written bucketed by cid, making the probe a pruned
  * scan); exact cosine re-rank on candidates only.
  */
object SimilarityIvf {

  val nlist = 16
  val nprobe = 4
  val kmeansIters = 5
  val dims = 64

  private def vectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.embeddings(s, dir)
      .select($"vec_id", expr(VectorFns.asDouble("embedding")).as("v"))
      .withColumn("nrm", expr(VectorFns.norm("v")))
  }

  /** Per-row cluster id against a centroid literal: argmin over
    * |c|² − 2·v·c (monotone in L2 distance). */
  private def cidExpr: Column =
    expr(s"""array_position(
            |  transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)),
            |  array_min(transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)))
            |) - 1""".stripMargin).cast("int")

  /** Deterministic k-means: init = first nlist vectors by vec_id;
    * fixed iteration count; exact-decimal per-dim means. Returns the
    * final centroids and the corpus assignment (vec_id, cid, v, nrm). */
  def kmeans(s: SparkSession, dir: String): (Seq[Seq[Double]], DataFrame) = {
    import s.implicits._
    val v = vectors(s, dir)
    var cents: Seq[Seq[Double]] = v.filter($"vec_id" < nlist).orderBy($"vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    for (_ <- 1 to kmeansIters) {
      val assigned = v.withColumn("cents", typedLit(cents))
        .withColumn("cid", cidExpr)
      val stats = assigned
        .select($"cid", posexplode($"v").as(Seq("dim", "x")))
        .groupBy($"cid", $"dim")
        .agg(dsum($"x").as("sx"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
      cents = Seq.tabulate(nlist) { c =>
        Seq.tabulate(dims) { d =>
          stats.get((c, d)).map { case (sx, n) => sx / n }
            .getOrElse(cents(c)(d)) // empty cluster keeps its centroid
        }
      }
    }
    val assigned = v.withColumn("cents", typedLit(cents))
      .withColumn("cid", cidExpr)
      .select($"vec_id", $"cid", $"v", $"nrm")
    (cents, assigned)
  }

  /** IVF ANN: probe the nprobe closest lists per query, exact cosine
    * re-rank within them. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (cents, assigned) = kmeans(s, dir)
    val probes = vectors(s, dir)
      .filter($"vec_id" < Similarity.nQueries)
      .withColumn("cents", typedLit(cents))
      .withColumn("probes",
        expr(s"""transform(slice(array_sort(
                |  transform(sequence(0, ${nlist - 1}), i -> named_struct(
                |    's', element_at(transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)), i + 1),
                |    'c', i))), 1, $nprobe), p -> p.c)""".stripMargin))
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        explode($"probes").as("cid"))
    val cand = assigned.join(broadcast(probes),
        assigned("cid") === probes("cid") && $"vec_id" =!= $"query_id")
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    cand
      .withColumn("cosine",
        expr(rndSql(s"${VectorFns.dot("qv", "v")} / (qnrm * nrm)", 6)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= Similarity.k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  /** Cluster occupancy — the index's balance diagnostic. */
  def ivfClusterSizes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, assigned) = kmeans(s, dir)
    assigned.groupBy($"cid").agg(count(lit(1)).as("n_vectors"))
      .orderBy($"cid")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf" -> (annIvf _)
  )
}
