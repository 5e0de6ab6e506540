package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  /** Crafted corpus written as a documents.parquet so every
    * doc-operator runs through its real load path: two identical
    * docs, one near-dup (one word changed), one unrelated. */
  private lazy val craftedDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-docs").toString
    val base = (1 to 60).map(i => s"tok${i % 17}").mkString(" ")
    val near = base.split(" ").updated(30, "CHANGED").mkString(" ")
    val other = (1 to 60).map(i => s"other${i % 13}").mkString(" ")
    Seq((0L, base, "en", "src0", base.length.toLong),
        (1L, base, "en", "src0", base.length.toLong),
        (2L, near, "en", "src0", near.length.toLong),
        (3L, other, "en", "src0", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_exact groups identical texts under the min doc_id") {
    val rows = Dedup.dedupExact(spark, craftedDir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toList
    assert(rows == List((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngram jaccard: identical pair at 1.0, near-dup high, unrelated absent") {
    val pairs = Dedup.dedupNgramJaccard(spark, craftedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.8 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("minhash candidates cover all true near-dup pairs with accurate estimates") {
    val truePairs = Dedup.dedupNgramJaccard(spark, craftedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val est = Dedup.dedupMinhash(spark, craftedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // recall: every pair with Jaccard ≥ τ is a minhash candidate
    truePairs.foreach { case (p, j) =>
      assert(est.contains(p), s"missing candidate $p (jaccard $j)")
      assert(math.abs(est(p) - j) <= 0.25, s"estimate off for $p: est=${est(p)} true=$j")
    }
    // the unrelated doc never pairs with anything
    assert(!est.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("incremental dedup equals the from-scratch pair set on corpus×shard pairs") {
    val s = spark
    val isNew = (id: Long) =>
      id % Dedup.incrementalShardMod == Dedup.incrementalShardRem
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val inc = Dedup.dedupIncremental(s, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // ground truth: full recompute over the whole corpus, restricted
      // to pairs straddling the shard boundary, normalized to
      // (corpus_id, new_id)
      val expected = Dedup.dedupMinhash(s, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .collect {
          case (d1, d2, e) if isNew(d1) ^ isNew(d2) =>
            if (isNew(d2)) (d1, d2, e) else (d2, d1, e)
        }.toSet
      assert(inc == expected, s"at $dir: missing=${expected -- inc} extra=${inc -- expected}")
      assert(inc.nonEmpty, s"shard rule must straddle at least one pair at $dir")
    }
  }

  test("minhash recall of jaccard>=tau pairs is total on the real corpus") {
    val truePairs = Dedup.dedupNgramJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.dedupMinhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "test corpus should contain planted near-dups")
    assert((truePairs -- cand).isEmpty,
      s"minhash missed ${(truePairs -- cand).size} of ${truePairs.size} true pairs")
  }

  test("simhash: identical docs at hamming 0; unrelated doc absent") {
    val rows = Dedup.dedupSimhash(spark, craftedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 1L)) == 0L)
    assert(!rows.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash signature is permutation-sensitive but duplicate-stable") {
    val s = spark; import s.implicits._
    val sigs = Dedup.simhashSignatures(spark, craftedDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))        // identical text, identical signature
    assert(sigs(0L) != sigs(3L))        // unrelated text, different signature
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)) <
           java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))) // near-dup closer than unrelated
  }

  test("source sketches merge as elementwise minimum of member signatures") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    s.udf.register("graft_minhash_union",
      org.apache.spark.sql.functions.udaf(graft.functions.MinHashUnion))
    val sigs = graft.sources.Tables.documents(s, sfDir)
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .filter(size($"toks") >= 3)
      .withColumn("sig", expr("graft_minhash64(graft_shingles(toks))"))
      .select($"source", $"sig")
    val sketch = sigs.groupBy($"source")
      .agg(expr("graft_minhash_union(sig)").as("sketch"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // recompute the elementwise min locally from the member sigs
    val members = sigs.collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    members.groupBy(_._1).foreach { case (src, ms) =>
      val expect = ms.map(_._2).reduce((a, b) => a.zip(b).map(t => math.min(t._1, t._2)))
      assert(sketch(src) == expect, s"sketch mismatch for $src")
    }
    val rows = graft.operators.Dedup.dedupSourceSketch(s, sfDir).collect()
    assert(rows.length == 190) // C(20, 2) source pairs
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("df cap bounds the shingle-join blowup on a boilerplate-heavy corpus") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-boiler").toString
    val rng = new scala.util.Random(7)
    val boiler = (1 to 20).map(i => s"legal$i").mkString(" ")
    // 150 docs sharing one viral boilerplate sentence, otherwise unique
    val viral = (0 until 150).map { d =>
      val unique = (1 to 40).map(_ => s"w${rng.nextInt(1000000)}").mkString(" ")
      (d.toLong, s"$boiler $unique")
    }
    // one genuine near-dup pair with no boilerplate
    val base = (1 to 60).map(i => s"pair${i % 31}").mkString(" ")
    val docs = viral ++ Seq((1000L, base), (1001L, base))
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // candidate volume = Σ_s C(df, 2): the cap must collapse the viral
    // shingles' quadratic buckets while keeping everything else
    def volume(cap: Option[Int]): Long = {
      val ex = graft.sources.Tables.documents(s, dir)
        .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr("graft_shingles(toks)")).as("s"))
      val df = ex.groupBy($"s").agg(count(lit(1)).as("df"))
      cap.fold(df)(c => df.filter($"df" <= c))
        .agg(coalesce(sum(expr("df * (df - 1) / 2")), lit(0L)).cast("long"))
        .head.getLong(0)
    }
    val uncapped = volume(None)
    val capped = volume(Some(16))
    assert(uncapped >= 150L * 149 / 2, s"viral corpus must be quadratic uncapped: $uncapped")
    assert(capped < 2000, s"capped volume must be bounded: $capped")
    // the capped pipeline still finds the true pair, and no
    // boilerplate-only pair survives
    val pairs = Dedup.dedupNgramJaccard(s, dir, dfCap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.keySet == Set((1000L, 1001L)), s"got ${pairs.keySet}")
    assert(pairs((1000L, 1001L)) == 1.0)
  }

  /** A~B and B~C are near-dups but A and C are NOT (jaccard 0.49 < τ):
    * only transitive closure puts all three in one cluster. */
  private lazy val chainDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-chain").toString
    val a = (1 to 60).map(i => s"w$i")
    val b = a.zipWithIndex.map { case (w, i) => if (i >= 20 && i < 28) s"bx$i" else w }
    val c = b.zipWithIndex.map { case (w, i) => if (i >= 40 && i < 48) s"cx$i" else w }
    val lone = (1 to 60).map(i => s"z$i")
    Seq((10L, a), (11L, b), (12L, c), (13L, lone))
      .map { case (id, ts) => val t = ts.mkString(" "); (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("clusters: transitive chain collapses to one canonical; singleton self-labels") {
    val s = spark
    val dir = chainDir
    val pairs = Dedup.dedupNgramJaccard(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L), (11L, 12L)), s"edge set: $pairs")
    val cl = Dedup.dedupClusters(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(cl == List((10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L), (13L, 13L, 1L)),
      s"clusters: $cl")
  }

  test("minhash-candidate clusters equal the exact-pair clusters where recall is total") {
    val s = spark
    // the real corpus: the recall spec above proves banding catches
    // every τ-pair there, so the cluster assignments must coincide.
    // (The crafted chain's 0.71-jaccard edges sit below the 8×8
    // banding S-curve knee — by design banding trades such borderline
    // pairs away; the exact variant remains the oracle gate.)
    val exact = Dedup.dedupClusters(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val banded = Dedup.dedupClustersMinhash(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(banded == exact)
  }

  test("prefix-filtered jaccard equals the full inverted-index join, on fewer candidates") {
    val s = spark; import s.implicits._
    val full = Dedup.dedupNgramJaccard(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    val pfx = Dedup.dedupJaccardPrefix(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(pfx == full, s"prefix filter changed the result: ${pfx.diff(full).take(3)}")
    // the point of the technique: the prefix join must emit strictly
    // fewer candidate rows than pairing through every shared shingle
    val ex = Tables.documents(s, sfDir)
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .filter(size($"toks") >= 3)
      .withColumn("s", explode(expr("graft_shingles(toks)")))
      .select($"doc_id", $"s")
    val dfs = ex.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" <= Dedup.shingleDfCap)
    val capped = ex.join(dfs, "s")
    val fullCand = capped.as("a").join(capped.as("b"),
      $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id").count()
    val pfxEx = capped.groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"s"))).as("ord"))
      .withColumn("sh", expr("transform(ord, x -> x.s)"))
      .withColumn("pfx", expr(
        s"slice(sh, 1, size(sh) - cast(ceil(${Dedup.jaccardTau} * size(sh)) AS INT) + 1)"))
      .select($"doc_id", explode($"pfx").as("s"))
    val pfxCand = pfxEx.as("a").join(pfxEx.as("b"),
      $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id").count()
    assert(pfxCand < fullCand,
      s"prefix candidates ($pfxCand) not below full candidates ($fullCand)")
  }

  test("positional filter prunes >=3x the length-filtered prefix candidates") {
    val s = spark; import s.implicits._
    val docs = Dedup.jaccardPrefixDocs(s, sfDir).localCheckpoint(true)
    val t = Dedup.jaccardTau
    // the candidate set BEFORE the positional bound: prefix self-join
    // + PPJoin length filter only (the round-13 shape)
    val pfx = docs.select($"doc_id", $"n_sh", explode($"pfx").as("s"))
    val lengthOnly = pfx.as("a").join(pfx.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
          $"b.n_sh" >= $"a.n_sh" * t && $"a.n_sh" >= $"b.n_sh" * t)
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    val positional = Dedup.jaccardPrefixCand(docs).count()
    // measured 120 -> 28 here (sf0.001), 193,340 -> 66,406 at sf0.1:
    // the positional upper bound must keep pruning the verify stage's
    // input by at least 3x, or the filter has silently degraded
    assert(positional * 3 <= lengthOnly,
      s"positional candidates ($positional) not >=3x below length-only ($lengthOnly)")
    // soundness: every tau-pair the full join finds must survive the
    // positional cut (recall is asserted end-to-end by the equality
    // test above; this isolates the candidate stage)
    val truePairs = Dedup.dedupNgramJaccard(s, sfDir)
      .select($"doc1", $"doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candPairs = Dedup.jaccardPrefixCand(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.subsetOf(candPairs),
      s"positional filter dropped true pairs: ${(truePairs -- candPairs).take(3)}")
  }

  test("pointer-jumping collapses a 300-deep chain component in O(log d) rounds") {
    val s = spark; import s.implicits._
    // a pure path graph 0-1-2-…-299: diameter 299. Plain neighbor-min
    // needs 299 rounds (over the 50 cap); path-halving must land the
    // component minimum everywhere in ~log2(300)+confirmation rounds.
    val pairs = (0L until 299L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val universe = (0L until 300L).toDF("doc_id")
    val labs = graft.operators.Dedup
      .clustersOf(s, universe, pairs, graft.operators.Dedup.maxClusterIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labs.size == 300 && labs.values.forall(_ == 0L),
      s"non-minimal labels: ${labs.filter(_._2 != 0L).take(5)}")
    val rounds = graft.operators.Dedup.lastClusterRounds.get()
    assert(rounds <= 15, s"expected O(log 300) ≈ ≤15 rounds, took $rounds")
  }

  test("clusters raise loudly when the iteration cap cuts propagation short") {
    val s = spark
    // the 3-doc chain needs 2+ rounds; a cap of 1 must throw, never
    // silently return non-minimal labels
    val e = intercept[IllegalStateException] {
      graft.operators.Dedup.dedupClusters(s, chainDir, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("indexed embedding clusters match the direct variant exactly") {
    val direct = Dedup.dedupClustersEmbedding(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val indexed = Dedup.dedupClustersEmbeddingIndexed(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == direct,
      s"diff: ${(indexed diff direct).take(3)} / ${(direct diff indexed).take(3)}")
  }

  test("semantic prune keeps exactly one centroid-nearest member per cluster") {
    val clusters = Dedup.dedupClustersEmbedding(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = clusters.groupBy(_._2)
    val pruned = Dedup.dedupSemanticPrune(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // one decision row per cluster, covering all of them
    assert(pruned.map(_._1).toSet == byCluster.keySet)
    pruned.foreach { case (cid, size, kept, cos, nPruned) =>
      val members = byCluster(cid)
      assert(members.map(_._1).contains(kept), s"kept $kept not in cluster $cid")
      assert(size == members.length.toLong)
      assert(nPruned == size - 1)
      assert(cos >= -1.0 && cos <= 1.0 + 1e-9)
      if (size == 1L) {
        assert(kept == cid, "a singleton keeps itself")
        assert(math.abs(cos - 1.0) < 1e-6, s"cos(v, v) must be 1: $cos")
      }
    }
    // the prune is a real decision on this corpus: something gets cut
    assert(pruned.map(_._5).sum > 0, "corpus has near-dup clusters to prune")
  }

  test("lsh planner matches an independent S-curve computation and ranks sanely") {
    val rows = Dedup.dedupLshPlan(spark, craftedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == Dedup.lshPlanConfigs.length)
    rows.foreach { case (b, r, ec, rec, fp) =>
      assert(b * r == Dedup.minhashK.toLong)
      assert(rec >= 0.0 && rec <= 1.0 + 1e-9 && fp >= -1e-9)
      // the identical pair (j = 1) collides with probability exactly 1
      // under every configuration, so it always counts fully
      assert(ec >= 1.0 - 1e-9)
    }
    // candidates shrink monotonically as rows-per-band grows
    val byR = rows.sortBy(_._2)
    byR.sliding(2).foreach { case Array(a, c) =>
      assert(a._3 >= c._3 && a._4 >= c._4 - 1e-9,
        s"S-curve not monotone: $a vs $c")
    }
    // independent recomputation: crafted truth pairs are (0,1) j=1 and
    // (0,2),(1,2) at the same 0.8<j<1 — sum 1-(1-j^r)^b via math.pow
    val truth = Dedup.dedupNgramJaccard(spark, craftedDir).collect()
      .map(_.getDouble(3))
    assert(truth.length == 3)
    byR.foreach { case (b, r, ec, rec, _) =>
      val expect = truth.map(j =>
        1.0 - math.pow(1.0 - math.pow(j, r.toDouble), b.toDouble)).sum
      assert(math.abs(ec - expect) < 1e-3, s"($b,$r): $ec vs $expect")
      assert(math.abs(rec - expect / 3.0) < 1e-3)
    }
  }

  test("cost report agrees with the registered operators' own decisions") {
    val rep = Dedup.dedupCostReport(spark, craftedDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toMap
    // crafted corpus: docs 0,1 identical; 2 a near-dup of them; 3 unrelated
    assert(rep.keySet == Set("exact", "exact_normalized", "ngram_clusters"))
    rep.values.foreach { case (nDocs, _, _, _) => assert(nDocs == 4L) }
    assert(rep("exact")._2 == 1L, "one exact copy dropped")
    assert(rep("exact_normalized")._2 == 1L, "no ws-only variants here")
    assert(rep("ngram_clusters")._2 == 2L, "near-dup joins the cluster")
    // chars dropped follows the canonical-min rule: doc 1 loses to doc 0
    val base = Tables.documents(spark, craftedDir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rep("exact")._4 == base(1L))
    assert(rep("ngram_clusters")._4 == base(1L) + base(2L))
    // each tier can only drop at least as much as exact hashing
    assert(rep("ngram_clusters")._2 >= rep("exact")._2)
    assert(rep("exact_normalized")._2 >= rep("exact")._2)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.dedupEmbedding(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= Dedup.cosineTau)
    }
  }

  test("paragraph dedup drops mass boilerplate chunks, keeps order, no window") {
    val s = spark; import s.implicits._
    // adversarial shape: one 5-token chunk shared by every document —
    // the hot group a per-chunk window would hand to a single task.
    val n = 10000L
    val boiler = "alpha beta gamma delta epsilon"
    val dir = Files.createTempDirectory("graft-paradup").toString
    s.range(n)
      .select($"id".as("doc_id"),
        concat(lit(boiler + " u"), $"id", lit("a u"), $"id", lit("b u"),
          $"id", lit("c u"), $"id", lit("d u"), $"id", lit("e"))
          .as("text"),
        lit("en").as("lang"), lit("s0").as("source"), lit(0L).as("n_chars"))
      .union(s.range(n, n + 1).select($"id".as("doc_id"),
        lit(boiler).as("text"), lit("en").as("lang"), lit("s0").as("source"),
        lit(0L).as("n_chars")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupParagraph(s, dir)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    val rows = out.collect()
    assert(rows.length == n + 1)
    rows.foreach { r =>
      val (id, clean, dropped, kept) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      if (id == n) { // all-boilerplate doc survives as an empty shell
        assert(clean == "" && dropped == 1 && kept == 0, r.toString)
      } else { // boilerplate prefix cut, unique tail kept in chunk order
        assert(clean == s"u${id}a u${id}b u${id}c u${id}d u${id}e", r.toString)
        assert(dropped == 1 && kept == 1, r.toString)
      }
    }
  }

  test("bucketed embedding near-dup equals the all-pairs ground truth exactly") {
    val bucketed = Dedup.dedupEmbedding(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val allPairs = Dedup.dedupEmbeddingAllPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(allPairs.nonEmpty)
    assert(bucketed == allPairs,
      s"LSH banding must have recall 1.0 at spec SF: " +
        s"missing=${allPairs.toSet -- bucketed.toSet} extra=${bucketed.toSet -- allPairs.toSet}")
  }

  test("b-bit compression: debiased estimates track full MinHash per decile") {
    val s = spark
    val rows = graft.operators.Dedup.dedupMinhashBbit(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // the banding candidates and the full-precision pair count agree
    val nPairs = graft.operators.Dedup.dedupMinhash(s, sfDir).count()
    assert(rows.map(_._2).sum == nPairs)
    rows.foreach { case (bin, _, full, bbit, err) =>
      // the 2^-b debias keeps the compressed estimate within a few
      // hash-collisions of the full one on every similarity decile
      assert(err <= 0.05, s"bin $bin mean_abs_err $err")
      assert(math.abs(full - bbit) <= 0.05, s"bin $bin $full vs $bbit")
    }
    // exact duplicates survive compression exactly: all 64 low-4-bit
    // values match, r = 1, and the correction maps 1 -> 1
    rows.find(_._1 == 10L).foreach { case (_, _, full, bbit, _) =>
      assert(full == 1.0 && bbit == 1.0)
    }
  }

  test("span removal: planted cross-doc passage disappears, everything else survives") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spanrm").toString
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")   // 8 >= min 5: cut
    val idiom = (1 to 4).map(i => s"q$i").mkString(" ")     // 4 < min 5: kept
    val docs = Seq(
      (1L, s"a1 a2 a3 $passage a4 a5"),
      (2L, s"b1 b2 $passage b3 b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6"),
      (4L, s"d1 d2 $idiom d3"),
      (5L, s"e1 $idiom e2 e3"))
    docs.map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Dedup.dedupSpanRemoval(s, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // ONLY the 8-token duplicated passage disappears from docs 1-2
    assert(rows(1L) == ((13L, 1L, 8L, "a1 a2 a3 a4 a5")))
    assert(rows(2L) == ((13L, 1L, 8L, "b1 b2 b3 b4 b5")))
    // unique doc untouched
    assert(rows(3L) == ((6L, 0L, 0L, "c1 c2 c3 c4 c5 c6")))
    // a shared run BELOW the length floor is an idiom, not boilerplate
    assert(rows(4L) == ((7L, 0L, 0L, s"d1 d2 $idiom d3")))
    assert(rows(5L) == ((7L, 0L, 0L, s"e1 $idiom e2 e3")))
  }

  test("dedup retraction: probe = incremental minus tombstoned pairs; compaction = exact rebuild from retained corpus") {
    val s = spark; import s.implicits._
    import graft.operators.HybridSearch
    val deleted = Tables.documents(s, sfDir)
      .filter($"doc_id" % HybridSearch.retractMod === HybridSearch.retractRem)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty)
    val res = Dedup.dedupRetract(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // retraction = the incremental probe with every pair touching a
    // tombstone erased, nothing else
    val inc = Dedup.dedupIncremental(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.toSet ==
      inc.filter(p => !deleted.contains(p._1) && !deleted.contains(p._2)).toSet,
      "retraction must equal the incremental probe minus tombstoned pairs")
    res.foreach { case (c, n, _) =>
      assert(!deleted.contains(c) && !deleted.contains(n))
    }
    // signatures are purely per-doc (no corpus-wide statistics), so a
    // rebuild from the retained corpus would produce EXACTLY the
    // retained rows — band/bucket of a doc never depends on other
    // docs. Compaction must therefore reproduce the live index minus
    // tombstones bit-for-bit through its anti-join + bucketed rewrite
    // (the write round-trip BM25's stale-weight delta can't pin).
    Dedup.compactMinhashIndex(s, sfDir)
    val compacted = s.table(Dedup.retractCompactTable)
      .select($"band", $"bucket", $"doc_id", $"sig").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList)).toSet
    val retained = s.table(Dedup.incrementalIndexTable)
      .select($"band", $"bucket", $"doc_id", $"sig").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList))
      .filter(r => !deleted.contains(r._3)).toSet
    assert(compacted == retained,
      "compacted band index must exactly equal the retained rows")
    assert(compacted.exists(r => r._3 % Dedup.incrementalShardMod !=
      Dedup.incrementalShardRem), "compacted index lost the corpus split")
  }

  test("dedup_clusters_best keeps the best-quality copy where min-id keeps the first-crawled one") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-docs-best").toString
    // doc 1 = S+S (the mass-crawled copy with boilerplate doubling:
    // ttr 0.5, the LOWER quality) gets the LOWER id; doc 2 = S (the
    // clean copy) the higher id — so the min-id and argmax(quality)
    // winners provably differ. jaccard(shingles(S), shingles(S+S))
    // = 28/30 >= tau, so they cluster. doc 5 is an unrelated singleton.
    val sTxt = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    Seq((1L, s"$sTxt $sTxt", "en", "src0"),
        (2L, sTxt, "en", "src0"),
        (5L, other, "en", "src1"))
      .map(t => (t._1, t._2, t._3, t._4, t._2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val minId = graft.operators.Dedup.dedupClusters(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(minId(1L) == 1L && minId(2L) == 1L,
      s"min-id canonicalization should keep doc 1: $minId")
    val best = graft.operators.Dedup.dedupClustersBest(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(best(1L)._1 == 2L && best(2L)._1 == 2L,
      s"argmax(quality) must keep the clean copy, doc 2: $best")
    assert(best(1L)._3 == 2L && best(2L)._3 == 2L)
    assert(best(5L) == ((5L, best(5L)._2, 1L)), s"singleton self-canonical: $best")
    // the winner's quality is strictly higher than the loser's
    val q = graft.operators.TextAnalysis.textQuality(s, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(q(2L) > q(1L), s"construction broken: $q")
    assert(best(1L)._2 == q(2L), "canonical_quality must be the winner's score")
  }
}
