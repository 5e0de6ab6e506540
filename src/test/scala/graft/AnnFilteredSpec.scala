package graft

import graft.operators.{Similarity, SimilarityIvf}

/** ann_filtered (31ae): the selectivity failure the operator exists to
  * fix, constructed — on a skewed predicate (rare label inside dense
  * majority blobs) POST-filtering the unfiltered top-k returns ~zero
  * of the filtered truth, while the filter-aware probe (with its
  * per-query starved-list fallback) recovers it exactly. The hash
  * oracle proves the arithmetic; this spec proves the RETRIEVAL
  * property the oracle can't see. */
class AnnFilteredSpec extends SparkSpec {

  private val nClusters = 8
  private val dims = 64

  // 8 near-orthogonal majority blobs (label 0, 20 each, tiny tilts so
  // blob-mates dominate every unfiltered top-k) + ONE rare label-3
  // vector per blob at a big tilt (cos ≈ 0.89 to blob-mates — always
  // outranked by ≥ 19 closer label-0 neighbors). Rare slice = 8/168
  // ≈ 5% of the corpus. Query ids (vec_id < nQueries) interleave
  // across blobs as in SimilarityKnnSpec.
  private val label0 = for {
    j <- 0 until 20
    ci <- 0 until nClusters
  } yield {
    val a = Array.fill(dims)(0f)
    a(ci) = 1f
    a((ci + 1) % nClusters) = 0.01f * (j + 1)
    (j.toLong * nClusters + ci, a, 0)
  }
  private val label3 = (0 until nClusters).map { ci =>
    val a = Array.fill(dims)(0f)
    a(ci) = 1f
    a((ci + 1) % nClusters) = 0.5f
    (1000L + ci, a, SimilarityIvf.filterLabel)
  }
  private val vecs = label0 ++ label3

  private lazy val dir: String = {
    val s = spark; import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ann-filtered").toString
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** Exact filtered truth per query: top-k label-3 vectors by
    * (cosine desc, vec_id) — the ranking both engines quantize. */
  private def filteredTruth(q: Long): Seq[Long] = {
    val qv = vecs.find(_._1 == q).get._2
    val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
    label3.filter(_._1 != q).map { case (id, b, _) =>
      val dot = qv.zip(b).map { case (x, y) => x.toDouble * y }.sum
      (id, dot / (qn * math.sqrt(b.map(x => x.toDouble * x).sum)))
    }.sortBy { case (id, c) => (-c, id) }
      .take(Similarity.k).map(_._1)
  }

  private def recall(got: Map[Long, Set[Long]]): Double = {
    val queries = vecs.map(_._1).filter(_ < Similarity.nQueries)
    queries.map { q =>
      val t = filteredTruth(q).toSet
      (t & got.getOrElse(q, Set.empty)).size.toDouble / t.size
    }.sum / queries.size
  }

  test("post-filtering the unfiltered top-k under-recalls; the filtered probe doesn't") {
    val unfilteredTopK = SimilarityIvf.annIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val label3Ids = label3.map(_._1).toSet
    val postFiltered = unfilteredTopK.filter(p => label3Ids.contains(p._2))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    // every unfiltered top-k slot goes to a closer blob-mate: the
    // post-filter path has NOTHING to return
    assert(recall(postFiltered) <= 0.2,
      s"post-filter recall ${recall(postFiltered)} should collapse on a 5% slice")

    val rows = SimilarityIvf.annFiltered(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    val filteredGot = byQ.map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(recall(filteredGot) >= 0.9,
      s"filter-aware recall ${recall(filteredGot)}")

    // shape: k ranked label-3-only rows per query, never self
    byQ.foreach { case (q, rs) =>
      assert(rs.length == Similarity.k, s"query $q: ${rs.length} rows")
      assert(rs.map(_.getLong(1)).sorted.toList == (1L to rs.length).toList)
      rs.foreach { r =>
        assert(label3Ids.contains(r.getLong(2)), s"unfiltered leak: $r")
        assert(r.getLong(2) != q)
      }
    }
    // with 8 rare vectors over 16 lists and nprobe = 4, probed lists
    // can't hold k = 5 survivors for every query: the starved-query
    // fallback must fire somewhere — and when it does, its rows are
    // the EXACT filtered truth (brute force within the slice)
    val fbQueries = rows.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(fbQueries.nonEmpty, "no query exercised the fallback branch")
    fbQueries.foreach { q =>
      assert(byQ(q).sortBy(_.getLong(1)).map(_.getLong(2)).toList ==
        filteredTruth(q).toList, s"fallback query $q not exact")
    }
  }

  test("graph tier: post-filtering the unfiltered descent under-recalls; the filter-aware descent doesn't") {
    import graft.operators.SimilarityKnn
    val label3Ids = label3.map(_._1).toSet
    // the unfiltered graph search post-filtered: blob-mates dominate
    // every beam, so label-3 survivors rarely reach the emitted top-k
    val unfiltered = SimilarityKnn.annGraphSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val postFiltered = unfiltered.filter(p => label3Ids.contains(p._2))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    assert(recall(postFiltered) <= 0.2,
      s"post-filter graph recall ${recall(postFiltered)} should collapse on a 5% slice")
    val rows = SimilarityKnn.annGraphFiltered(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    val got = byQ.map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(recall(got) >= 0.9, s"filter-aware graph recall ${recall(got)}")
    byQ.foreach { case (q, rs) =>
      assert(rs.length == Similarity.k, s"query $q: ${rs.length} rows")
      assert(rs.map(_.getLong(1)).sorted.toList == (1L to rs.length).toList)
      rs.foreach { r =>
        assert(label3Ids.contains(r.getLong(2)), s"unfiltered leak: $r")
        assert(r.getLong(2) != q)
      }
    }
    // starved queries fall back to the exact filtered slice
    val fbQ = rows.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    fbQ.foreach { q =>
      assert(byQ(q).sortBy(_.getLong(1)).map(_.getLong(2)).toList ==
        filteredTruth(q).toList, s"fallback query $q not exact")
    }
  }
}
