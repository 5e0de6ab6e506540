package graft

import graft.operators.{Similarity, SimilarityIvf}

class SimilarityIvfSpec extends SparkSpec {

  test("kmeans is deterministic and covers the corpus") {
    val (c1, a1) = SimilarityIvf.kmeans(spark, sfDir)
    val (c2, _) = SimilarityIvf.kmeans(spark, sfDir)
    assert(c1 == c2) // exact-decimal sums → bit-identical centroids
    val assigned = a1.collect()
    assert(assigned.length == 500)
    assert(assigned.forall { r =>
      val cid = r.getInt(1); cid >= 0 && cid < SimilarityIvf.nlist })
  }

  test("every vector lands in its nearest centroid list") {
    val (cents, assigned) = SimilarityIvf.kmeans(spark, sfDir)
    def d2(v: Seq[Double], c: Seq[Double]): Double =
      c.map(x => x * x).sum - 2.0 * v.zip(c).map { case (a, b) => a * b }.sum
    assigned.collect().take(100).foreach { r =>
      val v = r.getSeq[Double](2)
      val cid = r.getInt(1)
      val best = cents.indices.minBy(i => d2(v, cents(i)))
      assert(cid == best, s"vec ${r.getLong(0)}: assigned $cid, nearest $best")
    }
  }

  test("ivf recall@k vs bruteforce clears the floor") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bf = pairs(Similarity.annBruteforce(spark, sfDir))
    val ivf = pairs(SimilarityIvf.annIvf(spark, sfDir))
    val recall = (bf & ivf).size.toDouble / bf.size
    // deterministic; nprobe/nlist = 1/4 of the corpus scanned
    assert(recall >= 0.30, s"recall@${Similarity.k} = $recall")
    println(s"ivf recall@${Similarity.k} = $recall")
  }

  test("ivf results never beat exact search and rank correctly") {
    val bf = Similarity.annBruteforce(spark, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val rows = SimilarityIvf.annIvf(spark, sfDir).collect()
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getDouble(3) <= bf(r.getLong(0)) + 1e-12)
    }
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivf append: grown index is row-identical to batch assignment of the union") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    SimilarityIvf.annIvfAppend(spark, sfDir) // build + append once
    val grown = spark.table(SimilarityIvf.ivfIndexTable)
      .select($"vec_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // batch path: EVERY vector (corpus + shard) assigned against the
    // same corpus-trained centroids in one pass — append-then-read
    // must be indistinguishable from it
    val (cents, _) = SimilarityIvf.kmeansCorpus(spark, sfDir)
    val batch = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .withColumn("cents", typedLit(cents))
      .withColumn("cid", expr(
        """array_position(
          |  transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)),
          |  array_min(transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)))
          |) - 1""".stripMargin).cast("int"))
      .select($"vec_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(grown == batch,
      s"grown index diverges from batch assignment: only-grown=${(grown -- batch).take(5)} only-batch=${(batch -- grown).take(5)}")
  }

  test("ivf append delta is exchange-free: row-local argmin, no shuffle") {
    val p = SimilarityIvf.ivfAppendDelta(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.count(
      _.dropWhile(c => !c.isLetter).startsWith("Exchange "))
    assert(shuffles == 0, s"append must be scan+project only:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"append must not join:\n$p")
  }

  test("probe join over the grown index reads the index side exchange-free") {
    import spark.implicits._
    SimilarityIvf.annIvfAppend(spark, sfDir)
    val probes = Seq((0, 0L)).toDF("cid", "query_id")
    val p = spark.table(SimilarityIvf.ivfIndexTable)
      .join(probes, "cid")
      .queryExecution.executedPlan.toString
    // the bucketed layout means the index side never reshuffles; only
    // the (tiny) probe side moves
    assert(!p.contains("Exchange hashpartitioning(cid"),
      s"index side must not reshuffle on cid:\n$p")
  }

  test("streaming ivf ingest: grown table equals one-batch assignment of the union") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val occ = graft.streaming.StreamOps.runIvfIngestToCompletion(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(occ.nonEmpty)
    // occupancy is internally consistent and covers the whole corpus
    assert(occ.forall { case (_, c, n, t) => c + n == t }, occ.mkString(", "))
    // zero-norm vectors are excluded from the IVF index (the engine's
    // documented degenerate-vector contract) — the coverage count and
    // the batch parity side must apply the same filter, or both
    // asserts fail spuriously on the 'zerovec' degenerate variant
    val nonDegenerateN = graft.sources.Tables.embeddings(spark, sfDir)
      .select(expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .filter(expr("graft_dot(v, v)") > 0).count()
    assert(occ.map(_._4).sum == nonDegenerateN)
    assert(occ.map(_._3).sum > 0, "some arrivals must actually land")
    // row-level parity: the streamed-append table is indistinguishable
    // from assigning corpus + shard in one batch against the same
    // corpus-trained centroids
    val grown = spark.table(SimilarityIvf.ivfStreamTable)
      .select($"vec_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val (cents, _) = SimilarityIvf.kmeansCorpus(spark, sfDir)
    val batch = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .filter(expr("graft_dot(v, v)") > 0)
      .withColumn("cents", typedLit(cents))
      .withColumn("cid", expr(
        """array_position(
          |  transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)),
          |  array_min(transform(cents, c -> graft_dot(c, c) - CAST(2 AS DOUBLE) * graft_dot(v, c)))
          |) - 1""".stripMargin).cast("int"))
      .select($"vec_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(grown == batch,
      s"grown stream table diverges: only-grown=${(grown -- batch).take(5)} only-batch=${(batch -- grown).take(5)}")
    // re-running the gate is idempotent (rebuild + single append)
    graft.streaming.StreamOps.runIvfIngestToCompletion(spark, sfDir)
    assert(spark.table(SimilarityIvf.ivfStreamTable).count() == batch.size.toLong)
  }

  test("probe join over the stream-grown inverted file reads the index side exchange-free") {
    import spark.implicits._
    graft.streaming.StreamOps.runIvfIngestToCompletion(spark, sfDir)
    val probes = Seq((0, 0L)).toDF("cid", "query_id")
    val p = spark.table(SimilarityIvf.ivfStreamTable)
      .join(probes, "cid")
      .queryExecution.executedPlan.toString
    // the streamed append lands in the bucket layout, so the grown
    // index side still never reshuffles; only the probe side moves
    assert(!p.contains("Exchange hashpartitioning(cid"),
      s"index side must not reshuffle on cid after streamed append:\n$p")
  }

  test("ivf retraction: tombstone probe = compacted probe; compacted index = retained assignment; deleted ids gone") {
    import spark.implicits._
    val s = spark
    val deleted = graft.sources.Tables.embeddings(s, sfDir)
      .filter($"vec_id" % graft.operators.HybridSearch.retractMod ===
        graft.operators.HybridSearch.retractRem)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty)
    val res = SimilarityIvf.annIvfRetract(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(res.nonEmpty)
    res.foreach { case (q, _, nb, _) =>
      assert(!deleted.contains(nb), s"deleted vector $nb returned")
      assert(!deleted.contains(q), s"deleted vector $q issued a query")
      assert(nb != q)
    }
    // probe-over-compacted (nothing left to tombstone) is
    // row-identical to tombstone-at-probe over the live index
    SimilarityIvf.compactIvfRetractIndex(s, sfDir)
    val emptyTomb = Seq.empty[Long].toDF("vec_id")
    val viaCompact = SimilarityIvf.ivfRetractProbe(s, sfDir,
        s.table(SimilarityIvf.ivfRetractCompactTable), emptyTomb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaCompact == res.toSet,
      s"compacted vs tombstoned probe diverged: ${viaCompact.size}/${res.size}")
    // compaction keeps EXACTLY the retained assignment (signatures of
    // membership are per-vector, so unlike BM25 there is no stale-
    // statistics delta in the rows themselves — centroids alone stay
    // snapshot geometry)
    val compacted = s.table(SimilarityIvf.ivfRetractCompactTable)
      .select($"vec_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val retained = s.table(SimilarityIvf.ivfRetractTable)
      .select($"vec_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .filter { case (v, _) => !deleted.contains(v) }.toSet
    assert(compacted == retained,
      "compacted inverted file must equal the retained assignment")
  }

  test("cluster purity accounts for every vector and bounds correctly") {
    val rows = SimilarityIvf.embedClusterPurity(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val corpus = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_._2).sum == corpus, "every vector belongs to exactly one cluster")
    rows.foreach { case (cid, n, nTop, purity) =>
      assert(nTop >= 1 && nTop <= n, s"cid $cid: majority count out of range")
      assert(purity > 0.0 && purity <= 1.0, s"cid $cid: purity $purity")
      assert(math.abs(purity - nTop.toDouble / n) < 1e-5)
    }
  }

  test("probe sweep: recall rises with scan fraction and anchors at 1.0") {
    val rows = SimilarityIvf.annIvfProbeSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == SimilarityIvf.probeSweep)
    rows.sliding(2).foreach { case Array((p1, s1, r1), (p2, s2, r2)) =>
      assert(s1 < s2, s"scan_frac must rise: p$p1 $s1 vs p$p2 $s2")
      assert(r1 <= r2, s"recall must not fall: p$p1 $r1 vs p$p2 $r2")
    }
    // nprobe = nlist scans every list: the exact result by definition
    assert(rows.last._3 == 1.0, s"exhaustive recall ${rows.last._3}")
    assert(rows.head._2 < 0.5, s"nprobe=1 should scan a fraction: ${rows.head._2}")
  }
}
