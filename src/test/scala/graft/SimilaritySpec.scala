package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

  test("bruteforce returns exactly k ranked neighbors per query") {
    val rows = Similarity.annBruteforce(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.nQueries)
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toList == (1L to Similarity.k).toList)
      // ranks follow descending cosine
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh neighbors are a subset of the corpus with valid cosines") {
    val rows = Similarity.annLsh(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) != r.getLong(0))  // never self
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("lsh recall@k vs bruteforce clears the floor") {
    val bf = pairs(Similarity.annBruteforce(spark, sfDir))
    val lsh = pairs(Similarity.annLsh(spark, sfDir))
    val recall = (bf & lsh).size.toDouble / bf.size
    // hash-seeded planes → deterministic; measured 0.42 on this
    // corpus (near-random vectors, max cosine ≈ 0.5 — the hard case
    // for hyperplane LSH). Floor set with margin.
    assert(recall >= 0.30, s"recall@${Similarity.k} = $recall")
  }

  test("covariance matrix is bit-identical under any partitioning") {
    val s = spark
    val a = graft.operators.Similarity.embedCovariance(s, sfDir).collect().map(_.toSeq).toSeq
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "5")
      val b = graft.operators.Similarity.embedCovariance(s, sfDir).collect().map(_.toSeq).toSeq
      assert(a == b, "decimal-quantized moment sums must be partitioning-independent")
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("pca basis is a unit near-eigenvector of the covariance matrix") {
    val s = spark
    val cov = graft.operators.Similarity.embedCovariance(s, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val d = cov.iterator.map(_._2).max
    val C = Array.ofDim[Double](d, d)
    cov.foreach { case (i, j, c) => C(i - 1)(j - 1) = c; C(j - 1)(i - 1) = c }
    val basis = graft.operators.Similarity.pcaBasis(s, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val v = Array.tabulate(d)(i => basis(i + 1))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"basis must be unit-norm: $norm")
    val cv = Array.tabulate(d)(i => (0 until d).map(j => C(i)(j) * v(j)).sum)
    val lambda = (0 until d).map(i => v(i) * cv(i)).sum
    assert(lambda > 0.0, s"dominant eigenvalue must be positive: $lambda")
    val resid = math.sqrt((0 until d).map(i => {
      val r = cv(i) - lambda * v(i); r * r
    }).sum)
    assert(resid < 0.05 * lambda,
      s"power iteration must converge: residual $resid vs lambda $lambda")
  }

  test("lsh found-neighbor cosine at rank 1 is near the true best") {
    val bf = Similarity.annBruteforce(spark, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val lsh = Similarity.annLsh(spark, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    lsh.foreach { case (q, c) =>
      assert(c <= bf(q) + 1e-12)          // can't beat exact search
      assert(c >= bf(q) - 0.25, s"query $q: lsh best $c far below true best ${bf(q)}")
    }
  }

  test("gramian moment path is bit-identical to the explode path") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDecimal(2).toBigInteger, r.getDecimal(3).toBigInteger,
          r.getDecimal(4).toBigInteger, r.getDecimal(5).toBigInteger,
          r.getLong(6)))).toMap
    val explodePath = rows(Similarity.embedMoments(spark, sfDir))
    val gramianPath = rows(Similarity.embedMomentsGramian(spark, sfDir))
    assert(explodePath.keySet == gramianPath.keySet)
    explodePath.foreach { case (k, v) =>
      assert(gramianPath(k) == v, s"moment cell $k diverges: $v vs ${gramianPath(k)}")
    }
  }

  test("whitened coordinates have unit population variance and zero mean") {
    val rows = Similarity.embedWhiten(spark, sfDir).collect()
    val n = rows.length.toDouble
    for ((col, name) <- Seq(1 -> "wc1", 2 -> "wc2")) {
      val xs = rows.map(_.getDouble(col))
      val mean = xs.sum / n
      val varp = xs.map(x => (x - mean) * (x - mean)).sum / n
      // covariance uses the population (1/n) convention, so the
      // whitened population variance is 1 up to the quantized
      // rounding of the staged basis
      assert(math.abs(mean) < 0.05, s"$name mean $mean")
      assert(math.abs(varp - 1.0) < 0.05, s"$name variance $varp must be ~1")
    }
  }

  test("hard negatives: cross-class only, cosine-sorted, dominated by the unrestricted top-1") {
    val hn = Similarity.annHardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getDouble(5)))
    assert(hn.nonEmpty)
    // every mined negative is from a DIFFERENT class
    assert(hn.forall { case (_, ql, _, _, nl, _) => ql != nl },
      s"same-class row: ${hn.find { case (_, ql, _, _, nl, _) => ql == nl }}")
    val byQ = hn.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      // ranks are 1..k and cosine non-increasing along them
      assert(sorted.map(_._3).sameElements(1L to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._6 >= p(1)._6), s"q=$q not sorted")
    }
    // the unrestricted exact top-1 searches a superset of candidates,
    // so it must dominate the best hard negative per query
    val bf1 = Similarity.annBruteforce(spark, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    byQ.foreach { case (q, rows) =>
      val hn1 = rows.minBy(_._3)._6
      assert(bf1(q) >= hn1 - 1e-9, s"q=$q: bruteforce ${bf1(q)} < hard-neg $hn1")
    }
  }

  test("jl projection concentrates norm ratios at 1 with the promised 2/k variance") {
    val rows = Similarity.embedJl(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getDouble(5))
    val n = ratios.length.toDouble
    val mean = ratios.sum / n
    // E[ratio] = 1 for a Rademacher projection; mean of ~500
    // independent ratios (each Var = 2/k = 0.125) lands within a few
    // sd/sqrt(n) of 1
    assert(math.abs(mean - 1.0) < 0.08, s"mean distortion $mean must be ~1")
    // per-vector concentration: sd = sqrt(2/k) = 0.354 — allow 4 sd
    assert(ratios.forall(r => r > 0.0 && r < 2.5),
      s"pathological distortion: ${ratios.filter(r => r <= 0 || r >= 2.5).mkString(",")}")
    val varr = ratios.map(r => (r - mean) * (r - mean)).sum / n
    assert(varr < 3.0 * 2.0 / Similarity.jlDim, s"ratio variance $varr vs promised ${2.0 / Similarity.jlDim}")
    // the projection is a contraction of information, not of scale:
    // projected norms are strictly positive wherever the input norm is
    assert(rows.forall(r => r.getDouble(4) <= 0.0 || r.getDouble(3) > 0.0),
      s"zeroed projection: ${rows.filter(r => r.getDouble(4) > 0 && r.getDouble(3) <= 0).mkString(",")}")
  }

  test("hamming refine dominates raw hamming recall and reports exact cosines") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bfRows = Similarity.annBruteforce(spark, sfDir).collect()
    val bf = pairs(Similarity.annBruteforce(spark, sfDir))
    val bfCos = bfRows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ham = pairs(Similarity.annHamming(spark, sfDir))
    val refRows = Similarity.annHammingRefine(spark, sfDir).collect()
    val ref = pairs(Similarity.annHammingRefine(spark, sfDir))
    val rawRecall = (bf & ham).size.toDouble / bf.size
    val refRecall = (bf & ref).size.toDouble / bf.size
    // the exact re-rank can only repair the sign-quantized ordering
    // inside the over-fetched shortlist, never lose a shortlisted
    // true neighbor
    assert(refRecall >= rawRecall - 1e-12,
      s"refine recall $refRecall must dominate raw hamming $rawRecall")
    println(s"hamming recall@${Similarity.k}: raw $rawRecall, refined $refRecall")
    // reported cosines are the EXACT metric: any refined pair the
    // bruteforce also ranked must carry the identical rounded cosine
    refRows.foreach { r =>
      bfCos.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(r.getDouble(3) == c,
          s"refined cosine must be exact for (${r.getLong(0)}, ${r.getLong(2)})")
      }
    }
  }

  test("norm audit catches zero vectors and norm explosions") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-normaudit").toString
    def v(x: Float*) = x.toArray
    // label 0: healthy unit vectors; label 1: one zero vector and one
    // norm-10 explosion around a healthy one
    Seq(
      (0L, v(1f, 0f, 0f, 0f), 0L),
      (1L, v(0f, 1f, 0f, 0f), 0L),
      (2L, v(0f, 0f, 0f, 0f), 1L),
      (3L, v(0f, 0f, 10f, 0f), 1L),
      (4L, v(0f, 0f, 0f, 1f), 1L))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.operators.Similarity.embedNormAudit(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows(0L) == ((2L, 0L, 1.0, 1.0, 1.0)), s"healthy label: ${rows(0L)}")
    val (n, nz, mn, mx, mean) = rows(1L)
    assert(n == 3L && nz == 1L, s"zero vector missed: ${rows(1L)}")
    assert(mn == 0.0 && mx == 10.0, s"norm envelope wrong: ${rows(1L)}")
    assert(math.abs(mean - 11.0 / 3) < 1e-5, s"mean norm wrong: $mean")
  }

  test("matryoshka sweep: rerank dominates direct truncation, full dim is exact") {
    val rows = Similarity.annMatryoshkaSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.mrlSweep)
    rows.foreach { case (d, direct, rerank) =>
      // a truth neighbor surviving the prefix top-k also survives the
      // exact rerank of the wider shortlist — dominance is structural
      assert(rerank >= direct, s"d=$d rerank $rerank < direct $direct")
    }
    // the full-length prefix IS the exact search
    assert(rows.last == ((64, 1.0, 1.0)), rows.last.toString)
  }

  test("knn eval: query sample is capped at the absolute bound regardless of corpus size") {
    val s = spark
    val rows = Similarity.embedKnnEval(s, sfDir).collect()
    val totalQueries = rows.map(_.getLong(1)).sum
    // sf0.001 has 500 vectors > cap → the probe must cost O(cap·corpus)
    assert(totalQueries == Similarity.knnEvalCap.toLong,
      s"query sample must be exactly the cap (${Similarity.knnEvalCap}), got $totalQueries")
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "n_correct bounded by n_queries")
    }
  }
}
