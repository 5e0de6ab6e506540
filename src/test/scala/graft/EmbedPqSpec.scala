package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbedPq

class EmbedPqSpec extends SparkSpec {

  test("pq codes are valid, deterministic across partition counts, argmin-consistent") {
    val s = spark; import s.implicits._
    val key = "spark.sql.shuffle.partitions"
    val orig = s.conf.get(key)
    def run() = EmbedPq.embedPq(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList
    val (r4, r13) = try {
      s.conf.set(key, "4"); val a = run()
      s.conf.set(key, "13"); val b = run()
      (a, b)
    } finally s.conf.set(key, orig)
    // decimal-exact k-means ⇒ identical codebooks and codes at any
    // parallelism — the reproducible-index property
    assert(r4 == r13)
    assert(r4.nonEmpty)
    r4.foreach { case (_, code, err) =>
      val ids = code.split("-").map(_.toInt)
      assert(ids.length == EmbedPq.pqM)
      assert(ids.forall(c => c >= 0 && c < EmbedPq.pqKsub), code)
      assert(err >= 0.0)
    }
    // argmin self-consistency + 1-codeword baseline, checked on the
    // driver against the trained codebooks for a sample of vectors
    val cbs = EmbedPq.trainCodebooks(s, sfDir)
    val vecs = graft.sources.Tables.embeddings(s, sfDir)
      .select($"vec_id", expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .filter($"vec_id" < 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codesOf = r4.map(r => r._1 -> r._2.split("-").map(_.toInt)).toMap
    vecs.foreach { case (id, v) =>
      (0 until EmbedPq.pqM).foreach { m =>
        val subv = v.slice(m * EmbedPq.pqDsub, (m + 1) * EmbedPq.pqDsub)
        val dists = cbs(m).map(c => l2(subv, c))
        assert(dists(codesOf(id)(m)) == dists.min,
          s"vec $id subspace $m: assigned ${codesOf(id)(m)} not argmin")
      }
    }
    // multi-codeword quantization must beat collapsing each subspace
    // to its single mean (k=1) on average — i.e., the codebook learns
    val errOf = r4.map(r => r._1 -> r._3).toMap
    val k1 = (0 until EmbedPq.pqM).map { m =>
      val subs = vecs.values.map(_.slice(m * EmbedPq.pqDsub, (m + 1) * EmbedPq.pqDsub))
      val mean = (0 until EmbedPq.pqDsub).map(d => subs.map(_(d)).sum / subs.size)
      subs.map(l2(_, mean)).sum / subs.size
    }.sum
    val pqAvg = vecs.keys.map(errOf).sum / vecs.size
    assert(pqAvg < k1, s"pq avg $pqAvg not below 1-codeword baseline $k1")
  }

  test("adc search recall clearly beats random selection on structureless data") {
    val s = spark; import s.implicits._
    val pq = EmbedPq.annPq(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    // exact L2 ground truth on the driver (bounded corpus at spec SF)
    val all = graft.sources.Tables.embeddings(s, sfDir)
      .select($"vec_id", expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val recalls = pq.map { case (q, approx) =>
      val exact = (all - q).toSeq
        .sortBy { case (id, v) => (l2(all(q), v), id) }
        .take(graft.operators.Similarity.k).map(_._1).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    // the spec corpus is iid-random 64-dim — the known-hard case for
    // any quantizer (no cluster structure; same reason LSH cannot
    // prune here, see SimilaritySpec). Random top-k selection scores
    // k/(N−1); ADC must beat that by 3× even on structureless data.
    val baseline = graft.operators.Similarity.k.toDouble / (all.size - 1)
    assert(mean >= 2 * baseline,
      s"mean ADC recall@${graft.operators.Similarity.k} = $mean, random = $baseline")
  }

  test("exact re-rank dominates raw ADC and reports exact distances") {
    val s = spark; import s.implicits._
    val k = graft.operators.Similarity.k
    def tops(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    val adc = tops(EmbedPq.annPq(s, sfDir))
    val refined = EmbedPq.annPqRefine(s, sfDir).collect()
    val ref = refined.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    val all = graft.sources.Tables.embeddings(s, sfDir)
      .select($"vec_id", expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def recall(tops: Map[Long, Set[Long]]) = {
      val rs = tops.map { case (q, approx) =>
        val exact = (all - q).toSeq
          .sortBy { case (id, v) => (l2(all(q), v), id) }
          .take(k).map(_._1).toSet
        approx.intersect(exact).size.toDouble / exact.size
      }
      rs.sum / rs.size
    }
    val (ra, rr) = (recall(adc), recall(ref))
    // same metric, same fetch budget: exact re-rank of the ADC
    // shortlist can only keep or improve what ADC alone returns
    assert(rr >= ra, s"refine recall $rr below raw ADC recall $ra")
    assert(rr > ra, s"refine recall $rr should strictly improve ADC $ra on this corpus")
    // reported distances are the exact L2², not the ADC estimate
    refined.foreach { r =>
      val truth = l2(all(r.getLong(0)), all(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - truth) < 1e-5,
        s"l2 ${r.getDouble(3)} vs exact $truth")
    }
  }

  test("opq rotation is orthonormal and cuts mean recon error vs raw PQ") {
    val s = spark; import s.implicits._
    val rot = EmbedPq.opqRotation(s, sfDir)
    val d = rot.length
    // R·Rᵀ = I: the rotation is a true isometry, so rotated-space
    // recon L2² is original-space recon L2² — the comparison below is
    // apples-to-apples
    for (i <- 0 until d; j <- i until d) {
      val dot = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R·Rt[$i][$j] = $dot")
    }
    def meanErr(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg($"recon_err")).head.getDouble(0)
    val pq = meanErr(EmbedPq.embedPq(s, sfDir))
    val opq = meanErr(EmbedPq.embedOpq(s, sfDir))
    assert(opq < pq,
      s"eigenvalue-allocated rotation should cut recon error: opq=$opq pq=$pq")
  }

  test("ivf_pq_refine recall dominates raw IVF×PQ at equal fetch; distances exact") {
    val s = spark; import s.implicits._
    val k = graft.operators.Similarity.k
    def tops(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    val raw = tops(EmbedPq.annIvfPq(s, sfDir).collect())
    val refined = EmbedPq.annIvfPqRefine(s, sfDir).collect()
    val ref = tops(refined)
    val all = graft.sources.Tables.embeddings(s, sfDir)
      .select($"vec_id", expr(graft.functions.VectorFns.asDouble("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def recall(tops: Map[Long, Set[Long]]) = {
      val rs = tops.map { case (q, approx) =>
        val exact = (all - q).toSeq
          .sortBy { case (id, v) => (l2(all(q), v), id) }
          .take(k).map(_._1).toSet
        approx.intersect(exact).size.toDouble / exact.size
      }
      rs.sum / rs.size
    }
    val (ra, rr) = (recall(raw), recall(ref))
    // the shortlist over-fetches within the probed lists, then exact
    // re-rank repairs quantization mis-ordering — it can only keep or
    // improve what the raw ADC top-k returns (probe recall loss is
    // common to both)
    assert(rr >= ra, s"ivf_pq_refine recall $rr below raw IVF×PQ recall $ra")
    // reported distances are the exact L2², not the ADC estimate
    refined.foreach { r =>
      val truth = l2(all(r.getLong(0)), all(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - truth) < 1e-5,
        s"l2 ${r.getDouble(3)} vs exact $truth")
    }
  }

  test("distortion report: opq's rotation never hurts, int8 is near-lossless, all tiers account every vector") {
    val rows = graft.operators.EmbedPq.embedDistortionReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set("pq", "opq", "int8", "binary"))
    val n = rows("pq")._2
    assert(rows.values.forall(_._2 == n), "every tier must score the same corpus")
    // OPQ trains its rotation to MINIMIZE this number — beating raw
    // PQ is the operator's reason to exist
    assert(rows("opq")._3 <= rows("pq")._3,
      s"opq ${rows("opq")._3} must not lose to pq ${rows("pq")._3}")
    // 72 bytes of int8 on unit vectors is near-lossless; any 8-byte
    // code is orders of magnitude coarser
    assert(rows("int8")._3 < 0.001 && rows("int8")._3 * 100 < rows("pq")._3,
      s"int8 ${rows("int8")._3} vs pq ${rows("pq")._3}")
    rows.foreach { case (t, (_, _, mean, max)) =>
      assert(mean >= 0 && max >= mean, s"$t: mean $mean max $max")
    }
  }
}
