package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, SimilarityIvf, SimilarityKnn}

class SimilarityKnnSpec extends SparkSpec {

  /** Exact cosine top-k graph (all nodes), spec-scale ground truth. */
  private lazy val exactTopK: Map[Long, Set[Long]] = {
    val s = spark; import s.implicits._
    val v: Map[Long, Array[Double]] = Similarity.vectors(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    v.map { case (id, a) =>
      val scored = v.toSeq.filter(_._1 != id).map { case (j, b) =>
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val cos = dot / (math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum))
        (j, cos)
      }
      id -> scored.sortBy { case (j, c) => (-c, j) }
        .take(SimilarityKnn.knnK).map(_._1).toSet
    }
  }

  private lazy val graphRows =
    SimilarityKnn.annKnnGraph(spark, sfDir).collect()

  test("knn graph covers every node with ranked, self-free neighbors") {
    val byNode = graphRows.groupBy(_.getLong(0))
    val n = Similarity.vectors(spark, sfDir).count()
    assert(byNode.size == n, s"${byNode.size} of $n nodes have neighbors")
    byNode.foreach { case (id, rs) =>
      assert(rs.length <= SimilarityKnn.knnK)
      assert(rs.map(_.getLong(1)).sorted.toList == (1L to rs.length).toList)
      rs.foreach(r => assert(r.getLong(2) != id, "self edge"))
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  private def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
    val approx = rows.groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    exactTopK.map { case (id, truth) =>
      (truth & approx.getOrElse(id, Set.empty)).size.toDouble / truth.size
    }.sum / exactTopK.size
  }

  test("nn-descent recall@k beats the floor and improves on the seed-only graph") {
    val recall = recallOf(graphRows)
    val seedRows = {
      val s = spark; import s.implicits._
      SimilarityKnn.poolOf(s, sfDir, 0)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"src").orderBy($"cosine".desc, $"dst")).cast("long"))
        .filter($"rank" <= SimilarityKnn.knnK)
        .select($"src", $"rank", $"dst", $"cosine").collect()
    }
    val seedRecall = recallOf(seedRows)
    assert(recall >= 0.50, s"nn-descent recall@${SimilarityKnn.knnK} = $recall")
    assert(recall > seedRecall,
      s"descent must improve on seeds: $recall vs seed $seedRecall")
  }

  test("recall report ranks the tiers sanely: refine dominates raw hamming, truth recall bounds hold") {
    val rows = SimilarityKnn.annRecallReport(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4), r.getLong(2)))
      .toMap
    assert(rows.keySet == Set("ann_lsh", "ann_matryoshka", "ann_hamming",
      "ann_hamming_refine", "ann_knn_graph", "ann_graph_search",
      "ann_ivf", "ann_ivf_pq", "ann_ivf_pq_refine", "ann_pq_refine",
      "ann_opq"))
    val maxPairs = Similarity.nQueries.toLong * SimilarityKnn.knnK
    rows.foreach { case (m, (nRet, nHits, rec, nCand)) =>
      assert(nRet <= maxPairs, s"$m returned $nRet > $maxPairs")
      assert(nHits <= nRet)
      assert(rec >= 0.0 && rec <= 1.0, s"$m recall $rec")
      assert(nCand > 0, s"$m scanned no candidates")
    }
    // the cost axis orders as the index structures promise: pruned
    // probes scan less than full ADC scans; the graph lookup scans
    // the least; refine adds exactly a bounded shortlist
    val cand = rows.map { case (m, t) => m -> t._4 }
    assert(cand("ann_ivf") < cand("ann_opq"),
      s"IVF pruning must scan less than a full scan: $cand")
    assert(cand("ann_ivf_pq") <= cand("ann_ivf_pq_refine"))
    assert(cand("ann_hamming") <= cand("ann_hamming_refine"))
    assert(cand("ann_knn_graph") < cand("ann_hamming"),
      s"the stored-graph lookup must be the cheap tier: $cand")
    // reconciliation with the probe sweep: the report's ann_ivf count
    // IS the sweep's n_candidates at nprobe = 4 (same construction)
    val sweep = SimilarityIvf.annIvfProbeSweep(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cand("ann_ivf") == sweep(SimilarityIvf.nprobe),
      s"report ${cand("ann_ivf")} vs sweep ${sweep(SimilarityIvf.nprobe)}")
    // the exact re-rank can only repair Hamming's quantization
    // mis-ordering (the 31v dominance property, visible here too)
    assert(rows("ann_hamming_refine")._3 >= rows("ann_hamming")._3)
    // the same dominance for the production stack: exact re-rank of
    // the IVF×PQ shortlist can't lose a shortlisted true neighbor
    assert(rows("ann_ivf_pq_refine")._3 >= rows("ann_ivf_pq")._3)
    // pruning can only lose candidates: raw IVF (exact cosine within
    // probed lists) bounds its PQ-compressed variant from above
    assert(rows("ann_ivf")._3 >= rows("ann_ivf_pq")._3)
  }

  test("graph search: ranked self-free top-k per query, recall at least the LSH tier's") {
    val rows = SimilarityKnn.annGraphSearch(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet.forall(_ < Similarity.nQueries))
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= Similarity.k)
      assert(rs.map(_.getLong(1)).sorted.toList == (1L to rs.length).toList)
      rs.foreach(r => assert(r.getLong(2) != qid, "self in results"))
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // the graph tier must justify its index cost: beam descent over
    // the staged edges has to at least match the LSH bucket probe
    val report = SimilarityKnn.annRecallReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(report("ann_graph_search") >= report("ann_lsh"),
      s"graph search ${report("ann_graph_search")} < lsh ${report("ann_lsh")}")
  }

  test("centroid seeding reaches clusters global entries provably miss") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gs-blobs").toString
    // 8 near-orthogonal clusters of 16 (axis direction + a small
    // next-axis tilt), ids interleaved mod 8 so the 10 query ids
    // (vec_id < nQueries) cover every cluster. Cluster size 16 >
    // searchK keeps the working graph's top-10 within-cluster, so a
    // beam seeded in the wrong cluster cannot walk out — the flat
    // greedy failure the IVF coarse entry layer exists to fix.
    val nClusters = 8
    val vecs = for {
      j <- 0 until 16
      ci <- 0 until nClusters
    } yield {
      val a = Array.fill(64)(0f)
      a(ci) = 1f
      a((ci + 1) % nClusters) = 0.01f * (j + 1)
      (j.toLong * nClusters + ci, a)
    }
    vecs.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def recallVsExact(rows: Array[org.apache.spark.sql.Row]): Double = {
      val v = vecs.toMap
      val approx = rows.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val queries = vecs.map(_._1).filter(_ < Similarity.nQueries)
      queries.map { q =>
        val qv = v(q)
        val truth = vecs.filter(_._1 != q).map { case (id, b) =>
          val dot = qv.zip(b).map { case (x, y) => x.toDouble * y }.sum
          (id, dot / (math.sqrt(qv.map(x => x.toDouble * x).sum) *
            math.sqrt(b.map(x => x.toDouble * x).sum)))
        }.sortBy { case (id, c) => (-c, id) }
          .take(Similarity.k).map(_._1).toSet
        (truth & approx.getOrElse(q, Set.empty)).size.toDouble / truth.size
      }.sum / queries.size
    }
    val centroid = recallVsExact(
      SimilarityKnn.annGraphSearch(s, dir).collect())
    val global = recallVsExact(
      SimilarityKnn.graphSearchGlobalEntry(s, dir).collect())
    // 4 shared entries cover at most 4 of the 8 clusters: at least
    // half the queries descend from a wrong-cluster seed and the
    // within-cluster edge structure strands them there
    assert(global <= 0.6, s"global-entry recall $global should under-recall")
    assert(centroid >= 0.9, s"centroid-seeded recall $centroid")
    assert(centroid > global,
      s"centroid seeding must beat global entries: $centroid vs $global")
  }

  test("graph append: inserted shard adjacency holds recall vs exact truth, corpus-only targets, rerun-stable") {
    val s = spark; import s.implicits._
    val (mod, rem) = (SimilarityIvf.ivfShardMod, SimilarityIvf.ivfShardRem)
    val r1 = SimilarityKnn.annGraphAppend(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(r1.nonEmpty)
    // every inserted node is a shard member; every target a corpus one
    r1.foreach { case (src, _, dst, _) =>
      assert(src % mod == rem, s"non-shard src $src in the appended adjacency")
      assert(dst % mod != rem, s"append linked to a non-corpus node $dst")
    }
    // ranked lists, no duplicates
    r1.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toList == (1L to rs.length).toList, s"node $src ranks")
      assert(rs.map(_._3).distinct.length == rs.length, s"node $src dup targets")
    }
    // recall vs the EXACT per-shard truth restricted to corpus
    // candidates (what the insert path can possibly link to)
    val v: Map[Long, Array[Double]] = Similarity.vectors(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val shardIds = v.keys.filter(_ % mod == rem).toSeq
    val rec = shardIds.map { q =>
      val a = v(q)
      val truth = v.toSeq.filter { case (j, _) => j % mod != rem }
        .map { case (j, b) =>
          val dot = a.zip(b).map { case (x, y) => x * y }.sum
          (j, dot / (math.sqrt(a.map(x => x * x).sum) *
            math.sqrt(b.map(x => x * x).sum)))
        }.sortBy { case (j, c) => (-c, j) }
        .take(SimilarityKnn.knnK).map(_._1).toSet
      val got = r1.filter(_._1 == q).map(_._3).toSet
      (truth & got).size.toDouble / truth.size
    }
    val recall = rec.sum / rec.size
    assert(recall >= 0.5, s"insert-path recall $recall vs exact per-shard truth")
    // rerun: base rebuild memo + exactly-once append — identical rows
    val r2 = SimilarityKnn.annGraphAppend(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(r1.toSet == r2.toSet, "rerunning the append changed the adjacency")
  }

  test("graph retraction: deleted ids neither query nor return; compaction relinks around deleted hubs") {
    val s = spark; import s.implicits._
    import graft.operators.HybridSearch
    val (mod, rem) = (HybridSearch.retractMod, HybridSearch.retractRem)
    val deleted = Similarity.vectors(s, sfDir)
      .filter($"vec_id" % mod === rem)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty)
    val res = SimilarityKnn.annGraphRetract(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(res.nonEmpty)
    res.foreach { case (q, _, nb, _, _) =>
      assert(!deleted.contains(nb), s"deleted vector $nb returned")
      assert(!deleted.contains(q), s"deleted vector $q issued a query")
      assert(nb != q)
    }
    res.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toList == (1L to rs.length).toList,
        s"query $q ranks not contiguous")
    }
    // compaction: no tombstoned node survives as src or dst, degrees
    // bounded, every edge is explainable (direct live edge or an HNSW
    // relink through a deleted hub), and at least one edge was
    // actually INHERITED — relinking re-routes rather than filtering
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"cosine".desc, $"dst")
    val search = SimilarityKnn.knnCandidatePool(s, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= SimilarityKnn.searchK)
      .select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val directLive = search.filter { case (a, b) =>
      !deleted.contains(a) && !deleted.contains(b) }
    val adj = search.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val relink = for {
      (a, t) <- search if !deleted.contains(a) && deleted.contains(t)
      u <- adj.getOrElse(t, Set.empty)
      if !deleted.contains(u) && u != a
    } yield (a, u)
    SimilarityKnn.compactKnnEdges(s, sfDir)
    val compacted = s.table(SimilarityKnn.knnEdgesRetCompactTable)
      .select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(compacted.nonEmpty)
    compacted.foreach { case (a, b) =>
      assert(!deleted.contains(a) && !deleted.contains(b),
        s"tombstoned node survived compaction: ($a,$b)")
      assert(directLive.contains((a, b)) || relink.contains((a, b)),
        s"unexplainable compacted edge ($a,$b)")
    }
    val degrees = compacted.groupBy(_._1).map(_._2.length)
    assert(degrees.max <= SimilarityKnn.searchK)
    assert(compacted.exists(e => !directLive.contains(e)),
      "compaction produced no inherited edges — relink rule inert")
  }

  test("graph edges carry exact quantized cosines") {
    val s = spark; import s.implicits._
    val v: Map[Long, Array[Double]] = Similarity.vectors(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    graphRows.take(200).foreach { r =>
      val (a, b) = (v(r.getLong(0)), v(r.getLong(2)))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      val q = math.floor(cos * 1e6 + 0.5) / 1e6
      assert(math.abs(q - r.getDouble(3)) < 1e-9,
        s"edge (${r.getLong(0)},${r.getLong(2)}): $q vs ${r.getDouble(3)}")
    }
  }
}
