package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Pipeline, TextAnalysis}

class PipelineSpec extends SparkSpec {

  test("sample_dedup_flatten keeps every canonical and tempers copies toward 1/n") {
    val s = spark; import s.implicits._
    // 40 identical copies (one cluster) + 60 unique docs. At n=40 the
    // per-copy admission probability is 1/40, so the cluster must
    // shrink drastically — while the canonical and every unique doc
    // survive unconditionally. Ids offset by 100k so the spec also
    // covers non-small ids.
    val dir = Files.createTempDirectory("graft-flatten").toString
    val rows = (0 until 40).map(i => (100000L + i, "dup dup dup", "en", "s0", 11L)) ++
      (0 until 60).map(i => (200000L + i, s"unique text $i", "en", "s0", 14L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.sampleDedupFlatten(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val byId = out.map(t => t._1 -> t).toMap
    // every unique doc survives as its own canonical
    (0 until 60).foreach { i =>
      val t = byId(200000L + i)
      assert(t._2 == 200000L + i && t._3 == 1L && t._4, t.toString)
    }
    // the duplicate cluster: canonical always kept, copies tempered
    val dups = out.filter(_._2 == 100000L)
    assert(byId.contains(100000L) && byId(100000L)._4, "canonical must survive")
    assert(dups.forall(_._3 == 40L))
    val extras = dups.count(!_._4)
    // E[extras] = 39/40 ≈ 1; the deterministic PRF admits a small
    // fixed set — far below the 39 copies, proving real tempering
    assert(extras < 10, s"cluster barely tempered: $extras of 39 copies admitted")
    // determinism across partitioning: same admitted set at any
    // shuffle-partition setting (pure row-local test + window)
    val key = "spark.sql.shuffle.partitions"
    val orig = s.conf.get(key)
    val again = try {
      s.conf.set(key, "3")
      Pipeline.sampleDedupFlatten(s, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    } finally s.conf.set(key, orig)
    assert(again.toSet == out.toSet)
  }

  test("sample_weighted favors long documents (weighted-inclusion bias)") {
    val s = spark; import s.implicits._
    // 200 docs, one source, weights 10..200: with k=50 the sample
    // must be an actual selection, so the w/u priority bias is
    // observable (at sf0.001 each stratum is ≤ k — no selection)
    val dir = Files.createTempDirectory("graft-wsample").toString
    Seq.tabulate(200) { i =>
      (i.toLong, "x", "en", "s0", ((i % 20) + 1) * 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sample = Pipeline.sampleWeighted(s, dir)
    val sMean = sample.agg(avg($"n_chars")).head.getDouble(0)
    val cMean = graft.sources.Tables.documents(s, dir)
      .agg(avg($"n_chars")).head.getDouble(0)
    // priority w/u makes inclusion probability increase with w — the
    // sample mean must sit clearly above the corpus mean
    // (deterministic PRF — no flakiness)
    assert(sMean > cMean,
      s"weighted sample mean $sMean must exceed corpus mean $cMean")
    // exactly k rows, ranked 1..k
    val perSrc = sample.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"rank").as("maxr")).collect()
    perSrc.foreach { r =>
      assert(r.getLong(1) == Pipeline.weightedK && r.getLong(1) == r.getLong(2), r.toString)
    }
  }

  /** Crafted corpus hitting every quality_filter rule, including the
    * precedence cases the real corpus doesn't exercise. */
  private lazy val craftedDir: String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-pipeline").toString
    val german = "der die das und " * 8            // 'lang' (32 toks, de)
    val shortEn = "the a of to and"                // 'length' (5 toks, en)
    val lowQ = ("the " * 24) + "the"               // 'quality' (25 toks, stop-heavy)
    val good = "the quick brown fox jumps over a lazy dog while " +
      "seventeen astronauts of mars assemble to calibrate and " +
      "paint twelve bright green telescopes near calm rivers"  // kept (29 toks)
    val germanShort = "der die das"                // precedence: lang beats length
    Seq(
      (0L, german.trim), (1L, shortEn), (2L, lowQ.trim),
      (3L, good), (4L, good),                      // 4 = exact dup of 3
      (5L, germanShort))
      .map { case (id, t) => (id, t, "xx", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("quality_filter assigns the first failing rule as reason") {
    val rows = Pipeline.qualityFilter(spark, craftedDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(0L) == (0L, "lang"))
    assert(rows(1L) == (0L, "length"))
    assert(rows(2L) == (0L, "quality"))
    assert(rows(3L) == (1L, "kept"))
    assert(rows(4L) == (0L, "duplicate"))
    assert(rows(5L) == (0L, "lang")) // lang checked before length
  }

  test("quality filter still judges documents missing from the canon snapshot") {
    val s = spark; import s.implicits._
    val docs = graft.sources.Tables.documents(s, craftedDir)
    // canon snapshot taken before doc 0 (unique text) existed — the
    // streaming shape where a new document's hash has no lookup row
    val staleCanon = Pipeline.canonicalIds(docs.filter($"doc_id" =!= 0L))
    val rows = Pipeline.qualityFilterOn(docs, staleCanon)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows.contains(0L), "unknown-hash doc must not be dropped")
    assert(rows(0L) == "lang") // judged as its own canonical
    assert(rows.size == 6)
  }

  test("quality_filter survives a mass-duplicated corpus without a hot-group window") {
    val s = spark; import s.implicits._
    // adversarial crawl shape: ~1e5 copies of one boilerplate page —
    // the exact-dup group a min-window over text_hash would hand to a
    // single task. The groupBy canon side collapses copies map-side.
    val n = 100000L
    val boiler = "the quick brown fox jumps over a lazy dog while " +
      "seventeen astronauts of mars assemble to calibrate and " +
      "paint twelve bright green telescopes near calm rivers"
    val dir = Files.createTempDirectory("graft-massdup").toString
    s.range(n).select($"id".as("doc_id"), lit(boiler).as("text"),
        lit("en").as("lang"), lit("s0").as("source"),
        lit(boiler.length.toLong).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.qualityFilter(s, dir)
    // structural guarantee: no WindowExec anywhere in the plan — the
    // only stages touching the hot hash are partial-aggregated or
    // AQE-skew-splittable joins
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    val agg = out.groupBy($"reason").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg("kept") == 1L, agg.toString)        // min doc_id survives
    assert(agg("duplicate") == n - 1, agg.toString)
    val kept = out.filter($"keep" === 1L).collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 0L)
  }

  test("heavy hitters are exact on a skewed corpus the sketch must not drop") {
    val s = spark; import s.implicits._
    // 3000 docs of one dominant word + 5000 docs each holding a
    // unique tail word: dominant freq 3000 > 8000/33 ≈ 242 (heavy),
    // every tail word freq 1 (not). The MG candidate pass must carry
    // the dominant term through the decrement churn of 5000 distinct
    // tail insertions per partition.
    val dir = Files.createTempDirectory("graft-hh").toString
    s.range(3000).select($"id".as("doc_id"), lit("dominant").as("text"),
        lit("en").as("lang"), lit("s0").as("source"), lit(8L).as("n_chars"))
      .union(s.range(3000, 8000).select($"id".as("doc_id"),
        concat(lit("tail"), $"id").as("text"),
        lit("en").as("lang"), lit("s0").as("source"), lit(8L).as("n_chars")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.corpusHeavyHitters(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq("dominant" -> 3000L), rows.toSeq.toString)
  }

  test("lm score ranks corpus-typical text above unseen transitions") {
    val s = spark; import s.implicits._
    // 50 docs repeat the same word transitions; one doc uses
    // transitions the corpus has never seen — its bigrams survive
    // only on smoothing mass and must score strictly lower
    val typical = "the quick brown fox jumps over the lazy dog"
    val gibberish = "dog the over fox brown jumps quick lazy the"
    val dir = Files.createTempDirectory("graft-lm").toString
    s.range(50).select($"id".as("doc_id"), lit(typical).as("text"),
        lit("en").as("lang"), lit("s0").as("source"), lit(0L).as("n_chars"))
      .union(s.range(50, 51).select($"id".as("doc_id"),
        lit(gibberish).as("text"), lit("en").as("lang"),
        lit("s0").as("source"), lit(0L).as("n_chars")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scores = Pipeline.textLmScore(s, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(50L) < scores(0L),
      s"gibberish ${scores(50L)} not below typical ${scores(0L)}")
  }

  test("stratified sample equals the closed-form fingerprint rule") {
    val s = spark; import s.implicits._
    val docs = graft.sources.Tables.documents(s, sfDir)
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fp = TextAnalysis.textFingerprint(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcOf = docs.select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = fp.keySet.filter { id =>
      val thr = math.min(1000L, 1000L * Pipeline.targetPerStratum / counts(srcOf(id)))
      fp(id) % 1000 < thr
    }
    val got = Pipeline.sampleStratified(s, sfDir).collect().map(_.getLong(0)).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty && got.size < fp.size, "sample must be a proper subset")
  }

  test("doc_pack tiles the corpus token stream without gaps or overlaps") {
    val rows = Pipeline.docPack(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // offsets are a gapless tiling in doc_id order
    rows.sliding(2).foreach {
      case Array((_, n1, o1, _, _), (_, _, o2, _, _)) => assert(o1 + n1 == o2)
      case _ =>
    }
    rows.foreach { case (_, _, off, bin, pos) =>
      assert(bin == off / Pipeline.packBudget)
      assert(pos == off % Pipeline.packBudget)
    }
    // budget actually splits the corpus into multiple bins
    assert(rows.map(_._4).distinct.length > 1)
  }

  test("token_ids ranks vocab by frequency and zeros OOV tokens") {
    val s = spark; import s.implicits._
    val ids = Pipeline.tokenIds(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ids.nonEmpty)
    // reconstruct: most frequent token must map to vid 1
    val toks = graft.sources.Tables.documents(s, sfDir)
      .select($"doc_id", explode(expr("split(trim(text), '\\\\s+')")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val freq = toks.groupBy(_._2).view.mapValues(_.size).toMap
    val topTok = freq.toSeq.sortBy { case (t, c) => (-c, t) }.head._1
    val vids = ids.map(_._3)
    // synthetic corpus vocabulary is smaller than vocabSize → every
    // distinct token gets an id and no OOV exists
    assert(vids.max == math.min(Pipeline.vocabSize, freq.size).toLong)
    // every position of the top token got vid 1
    val posOfTop = toks.count(_._2 == topTok)
    assert(ids.count(_._3 == 1L) == posOfTop)
    // OOV path: with a vocab smaller than the corpus vocabulary, the
    // rarest tokens map to 0 and exactly nVocab ids are assigned
    val small = Pipeline.tokenIds(s, sfDir, 5)
      .collect().map(_.getLong(2))
    assert(small.max == 5L)
    assert(small.count(_ == 0L) > 0)
    assert(small.distinct.sorted.toList == (0L to 5L).toList)
  }

  test("decontaminate flags exactly the docs sharing a 3-gram with the eval set") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-decon").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon"),       // eval
      (10L, "xx beta gamma delta yy zz"),           // shares "beta gamma delta"
      (11L, "one two three four five six"),         // clean
      (12L, "alpha beta qq gamma delta rr"))        // bigram overlap only → clean
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.decontaminate(s, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(10L) == (1L, 1L))
    assert(rows(11L) == (0L, 0L))
    assert(rows(12L) == (0L, 0L))
    assert(!rows.contains(0L)) // eval docs are not judged
  }

  test("text_repetition scores trigram dominance") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-rep").toString
    Seq((0L, "x y z x y z x y z"), (1L, "a b c d e f g"))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textRepetition(s, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // 9 tokens → 7 trigrams: "x y z"×3, "y z x"×2, "z x y"×2
    assert(rows(0L) == (7L, 3L, 3L, 0.4286))
    // all-distinct doc: 5 trigrams, top 1
    assert(rows(1L) == (5L, 5L, 1L, 0.2))
  }

  test("corpus_ngrams counts occurrences and document frequency") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-ngrams").toString
    Seq((0L, "x y x y z"), (1L, "x y q"), (2L, "solo"))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.corpusNgrams(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // "x y" occurs 3x across 2 docs; ties broken by bigram asc; the
    // 1-token doc contributes nothing
    assert(rows.head == ("x y", 3L, 2L))
    assert(rows.tail.toSet == Set(("y x", 1L, 1L), ("y z", 1L, 1L), ("x y q", 0L, 0L), ("y q", 1L, 1L)).filter(_._2 > 0))
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse)
  }

  test("count-min sketch never underestimates any token") {
    val s = spark; import s.implicits._
    val toks = graft.sources.Tables.documents(s, sfDir)
      .select(explode(expr("split(trim(text), '\\\\s+')")).as("token"))
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("n"))
    val depths = (0 until Pipeline.cmsDepth).toDF("i")
    val cells = toks.crossJoin(broadcast(depths))
      .select($"i", substring(md5(concat($"i".cast("string"), lit(":"), $"token")), 1,
        Pipeline.cmsHexChars).as("cell"))
      .groupBy($"i", $"cell").agg(count(lit(1)).as("c"))
    val est = exact.crossJoin(broadcast(depths))
      .select($"token", $"n", $"i",
        substring(md5(concat($"i".cast("string"), lit(":"), $"token")), 1,
          Pipeline.cmsHexChars).as("cell"))
      .join(cells, Seq("i", "cell"))
      .groupBy($"token", $"n").agg(min($"c").as("est"))
    val bad = est.filter($"est" < $"n").count()
    assert(bad == 0L, s"$bad tokens underestimated — CMS bound violated")
    // and the sketch is not vacuous: some estimate is exact
    assert(est.filter($"est" === $"n").count() > 0L)
  }

  test("corpus drift flags the alien source and scores clones near zero") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-drift").toString
    val prose = "the quick brown fox jumps over the lazy dog near calm rivers"
    Seq(
      (0L, prose, "organic_a"), (1L, prose, "organic_a"),
      (2L, prose, "organic_b"), (3L, prose, "organic_b"),
      // injected spam: disjoint vocabulary, same token count
      (4L, "zzq wkx vvp qqj zzq wkx vvp qqj zzq wkx vvp qqj", "spam"))
      .toDF("doc_id", "text", "source")
      .select($"doc_id", $"text", lit("en").as("lang"), $"source",
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kl = Pipeline.corpusDrift(s, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // identical sources measure identically; the disjoint-vocab source
    // sits far above both (absolute magnitudes stay modest at tiny
    // token counts — add-one smoothing dominates — so test the RATIO)
    assert(kl("organic_a") == kl("organic_b"), kl.toString)
    assert(kl("spam") > 5.0 * kl("organic_a"), kl.toString)
    assert(kl.values.forall(_ >= 0.0), "KL is non-negative")
  }

  test("split_assign partitions the corpus deterministically at ~1/1/98") {
    val s = spark; import s.implicits._
    val a = graft.operators.Pipeline.splitAssign(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val total = graft.sources.Tables.documents(s, sfDir).count()
    assert(a.size == total, "every document gets exactly one split")
    val bySplit = a.values.groupBy(identity).view.mapValues(_.size).toMap
    val test_ = bySplit.getOrElse("test", 0)
    val value = bySplit.getOrElse("val", 0)
    val train = bySplit.getOrElse("train", 0)
    assert(test_ + value + train == total.toInt)
    // hash split at 1%/1%/98%: loose binomial envelope at 500 docs
    assert(test_ <= total * 0.05, s"test split too large: $test_/$total")
    assert(value <= total * 0.05, s"val split too large: $value/$total")
    assert(train >= total * 0.90, s"train split too small: $train/$total")
    // append-stability: the assignment is a pure function of doc_id —
    // recomputing over any sub-corpus must agree on shared docs
    val ids = a.keys.toSeq.sorted.take(50).toSet
    val sub = graft.operators.Pipeline.splitAssign(s, sfDir)
      .filter($"doc_id".isin(ids.toSeq: _*)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub == a.filter(kv => ids(kv._1)))
  }

  test("span decontamination flags 13-token contiguous overlap, not 12, and spans straddle eval windows") {
    val s = spark; import s.implicits._
    val evalWords = (1 to 30).map(i => s"e$i")   // eval doc: e1..e30
    // doc 100: contains e5..e17 (exactly 13 contiguous eval tokens)
    // doc 101: contains e5..e16 (12 tokens — must stay clean)
    // doc 102: 13-token overlap straddling its own filler boundary
    // doc 103: no overlap at all
    val docs = Seq(
      (1L, evalWords.mkString(" ")),
      (100L, ("x1 x2 " + (5 to 17).map(i => s"e$i").mkString(" ") + " y1 y2")),
      (101L, ("x1 x2 " + (5 to 16).map(i => s"e$i").mkString(" ") + " y1 y2")),
      (102L, ((10 to 16).map(i => s"e$i").mkString(" ") + " " +
        (17 to 22).map(i => s"e$i").mkString(" "))),
      (103L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Pipeline.decontaminateSpanOf(s, docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    assert(r(100L) == ((1L, 1L, 3L)),
      s"exactly one 13-gram, starting at token 3: ${r(100L)}")
    assert(r(101L) == ((0L, 0L, -1L)), s"12-token overlap must be clean: ${r(101L)}")
    assert(r(102L)._1 == 1L, s"13 contiguous eval tokens across doc-side filler: ${r(102L)}")
    assert(r(103L) == ((0L, 0L, -1L)))
  }

  test("contamination report counts leaked windows and carrier docs per eval doc") {
    val s = spark; import s.implicits._
    val evalWords = (1 to 30).map(i => s"e$i")
    val docs = Seq(
      (1L, evalWords.mkString(" ")),                              // 18 windows
      (100L, ("x1 x2 " + (5 to 17).map(i => s"e$i").mkString(" ") + " y1 y2")),
      (102L, (10 to 22).map(i => s"e$i").mkString(" ")),
      (103L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    // drive the same engine code over the crafted frame via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("graft-leak").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Pipeline.corpusContaminationReport(s, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getLong(4)))
    assert(r.length == 1)
    val (ed, nw, leaked, ratio, hitDocs) = r.head
    assert(ed == 1L && nw == 18L)
    // doc 100 carries window e5..e17, doc 102 carries e10..e22
    assert(leaked == 2L && hitDocs == 2L)
    assert(math.abs(ratio - math.floor(2.0 / 18.0 * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("contamination report agrees with span decontamination on whether anything leaked") {
    val s = spark
    val evalSide = Pipeline.corpusContaminationReport(s, sfDir).collect()
    val trainSide = Pipeline.decontaminateSpan(s, sfDir).collect()
    val evalSaysLeak = evalSide.exists(_.getLong(2) > 0)
    val trainSaysLeak = trainSide.exists(_.getLong(1) == 1L)
    assert(evalSaysLeak == trainSaysLeak,
      "both directions must agree on corpus-level contamination")
    evalSide.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "leaked_windows <= n_windows")
    }
  }

  test("span decontamination is strictly less aggressive than 3-gram decontamination") {
    val s = spark; import s.implicits._
    val spanFlagged = Pipeline.decontaminateSpan(s, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    val ngramFlagged = Pipeline.decontaminate(s, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    assert(spanFlagged.subsetOf(ngramFlagged),
      "a shared 13-gram implies shared 3-grams")
  }

  test("corpus_chunk windows overlap by size−stride and cover every token") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-chunk").toString
    val t80 = (0 until 80).map(i => s"w$i").mkString(" ")
    Seq((1L, t80, "en", "s0", t80.length.toLong),
        (2L, "a b c", "en", "s0", 5L),
        (3L, "   ", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.corpusChunk(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // 80 tokens at C=32/S=24 → starts 0,24,48 — full windows only
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._4)).toSeq == Seq((0L, 32L), (24L, 32L), (48L, 32L)), d1.mkString("; "))
    // consecutive chunks share exactly C−S = 8 tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._5.split(" ").takeRight(8).toSeq == b._5.split(" ").take(8).toSeq,
        s"overlap broken between ${a._2} and ${b._2}")
    }
    // coverage: the strided union re-spells the document
    val rebuilt = d1.head._5.split(" ") ++ d1.tail.flatMap(_._5.split(" ").drop(8))
    assert(rebuilt.mkString(" ") == t80, "chunks must cover every token exactly once in order")
    // short doc → one whole-doc chunk; whitespace-only doc → nothing
    assert(out.filter(_._1 == 2L).toSeq.map(c => (c._3, c._4, c._5)) == Seq((0L, 3L, "a b c")))
    assert(!out.exists(_._1 == 3L), "zero-token docs must emit no chunks")
  }

  test("corpus_cdc_chunk boundaries re-synchronize after a head insertion") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-cdc").toString
    // varied lengths/letters so the identity PRF fires on some tokens
    val words = (0 until 60).map(i => ("abcdefghij" (i % 10)).toString * (1 + i % 7))
    val a = words.mkString(" ")
    val b = ("zq " + a) // one token prepended
    Seq((10L, a, "en", "s0", a.length.toLong), (11L, b, "en", "s0", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.corpusCdcChunk(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4)))
    val ca = out.filter(_._1 == 10L).sortBy(_._2).map(_._3)
    val cb = out.filter(_._1 == 11L).sortBy(_._2).map(_._3)
    assert(ca.length >= 3, s"crafted corpus must cut ≥3 chunks, got ${ca.length}")
    // the insertion lands in chunk 0; every boundary after the first
    // cut token re-synchronizes, so the tails are IDENTICAL in order
    assert(ca.toSeq.drop(1) == cb.toSeq.drop(1),
      s"CDC must re-synchronize after the first boundary:\nA=${ca.mkString("|")}\nB=${cb.mkString("|")}")
    // and the shared tail chunks carry the dedup signal: n_occ = 2
    val occ = out.filter(t => t._1 == 10L && t._2 > 0).map(_._4)
    assert(occ.forall(_ == 2L), s"shared tail chunks must count both docs: ${occ.mkString(",")}")
  }

  test("dedup_cdc catches a shared passage at a DIFFERENT offset — the case fixed windows miss") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-cdcdedup").toString
    val words = (0 until 60).map(i => ("abcdefghij" (i % 10)).toString * (1 + i % 7))
    val passage = words.mkString(" ")
    // doc 1 IS the passage; doc 2 embeds it one token deep (offsets
    // shifted — a fixed-window chunker sees entirely different rows)
    Seq((1L, passage, "en", "s0", passage.length.toLong),
        (2L, "zq " + passage, "en", "s0", passage.length + 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.dedupCdc(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val (n1, k1, t1) = out(1L)
    assert(n1 == k1 && t1 == passage, "the canonical doc must keep everything verbatim")
    val (n2, k2, t2) = out(2L)
    // doc 2 keeps ONLY its first chunk (the zq-prefixed head) — every
    // re-synchronized tail chunk dedups against doc 1
    assert(k2 == 1L && k2 < n2, s"shifted passage must dedup: kept $k2 of $n2")
    assert(t2.startsWith("zq ") && t2.length < passage.length / 2,
      s"survivor should be the short head, got ${t2.length} chars")
  }

  test("dp release noise is deterministic, bounded, and actually present") {
    val s = spark
    val a = graft.operators.Relational.qDpCounts(s, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    val b = graft.operators.Relational.qDpCounts(s, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    assert(a.toSeq == b.toSeq, "re-running the release must publish the SAME sample (budget idempotence)")
    val truth = {
      import s.implicits._
      graft.sources.Tables.events(s, sfDir)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    }
    val noises = a.map { case (t, d, noisy) => noisy - truth((t, d)) }
    // Laplace(1/ε) from a (0,1) PRF: |noise| ≤ ln(2^31)/ε ≈ 21.5
    assert(noises.forall(n => math.abs(n) <= 22.0), s"noise out of envelope: ${noises.max}")
    assert(noises.exists(n => math.abs(n) > 0.01), "noise must actually perturb")
    assert(noises.exists(_ > 0) && noises.exists(_ < 0), "noise must be two-sided")
  }

  test("entity sample keeps whole users: per-user event counts equal the unsampled counts") {
    val s = spark; import s.implicits._
    val sampled = Pipeline.sampleEntity(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sampled.nonEmpty, "a ~10% cut must select someone")
    val full = graft.sources.Tables.events(s, sfDir)
      .filter($"user_id".isin(sampled.keys.toSeq: _*))
      .groupBy($"user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sampled == full,
      s"selected users must carry their COMPLETE event history: ${sampled.size} vs ${full.size}")
    // and the cut is a sample, not the universe (the small-id Lehmer
    // trap this operator's multiplier exists to avoid)
    val nUsers = graft.sources.Tables.events(s, sfDir)
      .select($"user_id").distinct().count()
    assert(sampled.size < nUsers / 2, s"${sampled.size} of $nUsers selected — not a sample")
  }

  test("k-center traversal covers every separated cluster before densifying") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kcenter").toString
    // four tight clusters at the corners of a far-apart square: the
    // farthest-point traversal MUST visit all four clusters in its
    // first four picks (any sampler that prefers density would not),
    // and only then start refining within clusters
    val corners = Seq((0f, 0f), (100f, 0f), (0f, 100f), (100f, 100f))
    val vecs = for {
      (c, ci) <- corners.zipWithIndex
      j <- 0 until 10
    } yield (ci * 10L + j,
      Array(c._1 + (j % 3) * 0.1f, c._2 + (j % 5) * 0.1f, 0f, 0f), ci.toLong)
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Pipeline.sampleKcenter(s, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.length == Pipeline.kCenters)
    val clusterOf = rows.map(_._2 / 10L)
    assert(clusterOf.take(4).distinct.length == 4,
      s"first 4 picks must hit all 4 clusters: ${rows.mkString(", ")}")
    // greedy invariant: the max-min coverage radius never increases
    val radii = rows.flatMap(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius increased: $a -> $b in ${radii.mkString(",")}")
    }
    // after the 4 corners the radius collapses from cross-cluster
    // (~100^2) to within-cluster (<1) scale
    assert(radii(2) > 1000.0 && radii(3) < 1.0, radii.mkString(","))
  }

  test("semantic decontamination flags a planted paraphrase, not an orthogonal doc or a zero vector") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-semdecon").toString
    val d = 64
    // eval vector (id < evalVecMaxId): a fixed direction
    def base(i: Int): Float = ((i % 7) - 3).toFloat
    val evalVec = Array.tabulate(d)(base)
    // "paraphrase": the eval direction plus small noise (cosine ≈ 0.99)
    val para = Array.tabulate(d)(i => base(i) + 0.05f * ((i % 3) - 1))
    // orthogonal: support on a rotated index pattern, cosine far below τ
    val orth = Array.tabulate(d)(i => (((i * 31 + 5) % 7) - 3).toFloat)
    val zero = Array.fill(d)(0f)
    Seq(
      (3L, evalVec, 0L),
      (30L, para, 0L),
      (40L, orth, 1L),
      (50L, zero, 1L))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Pipeline.decontaminateSemantic(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows.keySet == Set(30L, 40L, 50L), s"corpus side only: ${rows.keySet}")
    val (c30, n30, cos30) = rows(30L)
    assert(c30 == 1L && n30 == 1L && cos30.exists(_ >= Pipeline.semanticTau),
      s"planted paraphrase must be flagged: ${rows(30L)}")
    assert(rows(40L) == ((0L, 0L, None)), s"orthogonal doc is clean: ${rows(40L)}")
    assert(rows(50L) == ((0L, 0L, None)),
      s"zero vector has no cosine and reads clean: ${rows(50L)}")
    // the EVAL-side view of the same plant: eval vector 3 is burned
    // by exactly the paraphrase, nothing else
    val burn = Pipeline.semanticContaminationReport(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(burn.keySet == Set(3L), s"eval side only: ${burn.keySet}")
    val (b, nb, bc) = burn(3L)
    assert(b == 1L && nb == 1L && bc.exists(_ >= Pipeline.semanticTau),
      s"eval 3 must read burned by the planted paraphrase: ${burn(3L)}")
  }

  test("dsir: target-vocabulary content outranks raw-vocabulary content, whatever its own label") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    // target (en) docs speak vocabulary A; the bulk raw corpus speaks
    // vocabulary B; doc 100 is LABELLED raw-side (xx) but SPEAKS the
    // target vocabulary — DSIR must rank it above every B-speaker,
    // because selection reads content, not labels
    val vocabA = "alpha beta gamma delta epsilon zeta"
    val vocabB = "omega sigma tau rho kappa lambda"
    val docs =
      (0L until 5L).map(i => (i, s"$vocabA alpha beta", "en")) ++
      (10L until 30L).map(i => (i, s"$vocabB omega sigma", "xx")) :+
      ((100L, s"$vocabA gamma delta", "xx"))
    docs.map { case (id, t, l) => (id, t, l, "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Pipeline.sampleDsir(s, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // output shape: sorted by logw desc then doc_id, n_grams > 0
    val lw = rows.map(_._2)
    assert(lw.zip(lw.tail).forall { case (a, b) => a >= b }, "not sorted")
    assert(rows.forall(_._3 > 0))
    val byId = rows.map(r => r._1 -> r._2).toMap
    val aSpeakers = Set(100L) ++ (0L until 5L)
    val bSpeakers = (10L until 30L).toSet
    assert(bSpeakers.forall(byId.contains), "raw docs missing from ranking")
    aSpeakers.foreach { a =>
      bSpeakers.foreach { b =>
        assert(byId(a) > byId(b),
          s"target-vocab doc $a (${byId(a)}) must outrank raw-vocab doc $b (${byId(b)})")
      }
    }
    // and the mislabelled A-speaker specifically beats every B-speaker
    assert(byId(100L) > bSpeakers.map(byId).max)
  }
}
