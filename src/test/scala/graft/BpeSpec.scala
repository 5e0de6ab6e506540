package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  private def docsOf(texts: (Long, String)*) = {
    val s = spark
    import s.implicits._
    texts.toSeq.toDF("doc_id", "text")
  }

  test("greedy merge order on a crafted corpus follows classic BPE") {
    // two copies of "aaab": round 1 the overlapping (a,a) pair counts
    // 4 (greedy left-to-right merges non-overlapping → [aa, a, b]);
    // round 2 ties (aa,a)=2 vs (a,b)=2 break lexicographically to
    // (a,b); round 3 merges (aa,ab); then no pairs remain and
    // training stops early.
    val m = Bpe.trainOf(docsOf(1L -> "aaab", 2L -> "aaab"))
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toList == List(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 2L),
      (3L, "aa", "ab", "aaab", 2L)))
  }

  test("merge table is identical under corpus repartitioning") {
    val docs = docsOf((0L until 40L).map(i =>
      i -> s"the quick brown fox ${"ab" * (i % 5).toInt} jumps over"): _*)
    val a = Bpe.trainOf(docs).orderBy("merge_rank").collect().map(_.toSeq).toList
    val b = Bpe.trainOf(docs.repartition(7)).orderBy("merge_rank")
      .collect().map(_.toSeq).toList
    assert(a == b, "pair counts are exact integers and the argmax " +
      "tiebreak is total — partitioning must not move any merge")
    assert(a.nonEmpty)
  }

  test("encoding pieces reassemble each token and honor trained merges") {
    val docs = docsOf(1L -> "banana bandana banana", 2L -> "ban ban banana")
    val mergesDf = Bpe.trainOf(docs)
    val merges = mergesDf.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val mergedSyms = mergesDf.collect().map(_.getString(3)).toSet
    val enc = Bpe.encodeOf(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // pieces per (doc, pos) concatenate back to the original token
    val rebuilt = enc.groupBy(t => (t._1, t._2)).map { case (k, ps) =>
      k -> ps.sortBy(_._3).map(_._4).mkString
    }
    val s = spark
    import s.implicits._
    val toks = docs
      .selectExpr("doc_id", "posexplode(split(trim(text), '\\\\s+')) AS (p0, tok)")
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1L) -> r.getString(2)).toMap
    assert(rebuilt == toks)
    // every multi-char piece is a trained merged symbol
    enc.map(_._4).filter(_.length > 1).foreach { p =>
      assert(mergedSyms.contains(p), s"piece '$p' is not a trained merge")
    }
  }

  test("bpe budget counts in pieces: per-source totals >= whitespace word counts") {
    val s = spark; import s.implicits._
    val bpe = Bpe.corpusTokenBudgetBpe(s, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = graft.sources.Tables.documents(s, sfDir)
      .selectExpr("source", "size(split(trim(text), '\\\\s+')) AS n")
      .groupBy($"source").agg(org.apache.spark.sql.functions.sum($"n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bpe.keySet == words.keySet)
    bpe.foreach { case (src, n) =>
      assert(n >= words(src), s"$src: $n BPE pieces < ${words(src)} words")
    }
    // and merges actually compress something below the char count
    assert(bpe.values.sum > 0)
  }

  test("bpe packing is a gapless token stream consistent with the bpe budget totals") {
    val pack = Bpe.docPackBpe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // offsets tile the stream with no gaps or overlaps in doc order
    pack.foldLeft(0L) { case (expected, (id, n, off)) =>
      assert(off == expected, s"doc $id offset $off, expected $expected")
      off + n
    }
    // and the stream's total equals the budget report's corpus total
    val packTotal = pack.map(_._2).sum
    val budgetTotal = Bpe.corpusTokenBudgetBpe(spark, sfDir).collect()
      .map(_.getLong(1)).sum
    assert(packTotal == budgetTotal,
      s"pack total $packTotal != budget total $budgetTotal")
  }

  test("pack efficiency: strategy invariants and cross-strategy dominance") {
    val perDoc = Bpe.perDocPieces(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = perDoc.map(_._2).sum
    val nonEmpty = perDoc.count(_._2 > 0).toLong
    val rows = Bpe.packEfficiencyReport(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(rows.size == Bpe.packContexts.size * 3)
    Bpe.packContexts.foreach { c =>
      val (ctS, ctK, ctP, ctT, _) = rows((c, "contiguous"))
      val (wdS, wdK, wdP, wdT, _) = rows((c, "whole_doc"))
      val (sdS, sdK, sdP, sdT, _) = rows((c, "single_doc"))
      // contiguous: the whole stream survives, ceil-division seqs,
      // padding only in the final partial sequence
      assert(ctK == total && ctT == 0L)
      assert(ctS == (total + c - 1) / c && ctP == ctS * c - total && ctP < c)
      // single-doc: one sequence per non-empty doc; truncation and
      // kept tokens agree with the no-split binning (same doc rule)
      assert(sdS == nonEmpty && sdK == wdK && sdT == wdT)
      // binning dominates pad-or-truncate, never beats the stream
      assert(wdS <= sdS && wdP <= sdP)
      assert(rows((c, "contiguous"))._5 >= rows((c, "whole_doc"))._5)
      // fill accounting closes exactly: kept + pad tiles the bins
      Seq((ctS, ctK, ctP), (wdS, wdK, wdP), (sdS, sdK, sdP)).foreach {
        case (s0, k0, p0) => assert(k0 + p0 == s0 * c)
      }
      assert(wdT == perDoc.map(t => math.max(0L, t._2 - c)).sum)
    }
  }

  test("vocab ids are dense, chars precede merges, frequencies match the encoded corpus") {
    val v = Bpe.bpeVocab(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(v.map(_._1).toList == (1L to v.length).toList, "dense ids")
    val (chars, merges) = v.partition(_._3 == "char")
    assert(chars.forall(_._2.length == 1) && merges.forall(_._2.length > 1))
    assert(chars.map(_._1).max < merges.map(_._1).min, "chars precede merges")
    assert(chars.map(_._2).toList == chars.map(_._2).toList.sorted,
      "chars in codepoint order")
    // frequencies equal the actual encoded corpus piece counts
    val encCounts = Bpe.tokenIdsBpe(spark, sfDir).groupBy("piece").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    v.foreach { case (_, piece, _, n) =>
      assert(n == encCounts.getOrElse(piece, 0L),
        s"vocab freq of '$piece' = $n, encoded corpus has ${encCounts.getOrElse(piece, 0L)}")
    }
    // and the encoder never emits a piece outside the vocab
    assert(encCounts.keySet.subsetOf(v.map(_._2).toSet))
  }

  test("fertility ratios bound correctly and piece totals reconcile with the per-doc counter") {
    val s = spark; import s.implicits._
    val rows = graft.operators.Bpe.bpeFertility(s, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, ch, p) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (fert, cpp) = (r.getDouble(5), r.getDouble(6))
      // every word is ≥1 piece; every piece carries ≥1 char
      assert(p >= w && ch >= p, s"piece bounds broken: words=$w chars=$ch pieces=$p")
      assert(fert >= 1.0 && cpp >= 1.0, s"ratio bounds broken: $fert / $cpp")
      // and the merges actually fire somewhere: pieces < chars
      // (all-singleton encoding would make them equal)
    }
    assert(rows.exists(r => r.getLong(4) < r.getLong(3)),
      "merges never fired: every group encodes as singletons")
    // group totals reconcile with the packing family's per-doc counter
    val total = rows.map(_.getLong(4)).sum
    val perDoc = graft.operators.Bpe.perDocPieces(s, sfDir)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens")).collect()(0).getLong(0)
    assert(total == perDoc,
      s"fertility pieces ($total) must equal per-doc pieces ($perDoc)")
  }

  test("training on the test corpus is non-trivial and fully ranked") {
    val m = Bpe.vocabBpeTrain(spark, sfDir).collect()
    assert(m.length == Bpe.bpeMerges,
      s"expected ${Bpe.bpeMerges} merges, got ${m.length}")
    assert(m.map(_.getLong(0)).toList == (1L to Bpe.bpeMerges).toList)
    // pair counts are non-increasing only weakly across ranks in
    // general BPE, but each must be positive
    assert(m.forall(_.getLong(4) > 0))
  }
}
