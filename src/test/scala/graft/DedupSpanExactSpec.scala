package graft

import graft.operators.Dedup

/** 29e'''' — the exact-ExactSubstr boundary semantics: the k=3 +
  * min-run-5 approximation (29e'') can cut where NO duplicated
  * substring of the threshold length exists; the exact variant
  * (window length = threshold, cut every covered position) cannot.
  * The planted case is the one the round-10 verdict called out: two
  * ADJACENT duplicated 4-token phrases whose covered runs merge to 8
  * under k=3 — the approximation cuts them, the exact operator keeps
  * them because the longest duplicated substring is 4 < 5. */
class DedupSpanExactSpec extends SparkSpec {

  private def mkCorpus(): String = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span-exact").toString
    val phraseA = "pa1 pa2 pa3 pa4"   // duplicated via doc 2
    val phraseB = "pb1 pb2 pb3 pb4"   // duplicated via doc 3
    val passage = "q1 q2 q3 q4 q5 q6" // ≥5-token true duplicate via doc 4
    Seq(
      // doc 1: A and B adjacent (the boundary case) + unique tail
      (1L, s"$phraseA $phraseB u1 u2 u3 u4 u5 u6", "en", "web"),
      // docs 2/3 re-use A and B separately, in unique contexts
      (2L, s"v1 v2 v3 $phraseA v4 v5 v6 v7", "en", "web"),
      (3L, s"w1 w2 w3 $phraseB w4 w5 w6 w7", "en", "web"),
      // docs 4/5 share a genuine 6-token passage
      (4L, s"x1 x2 $passage x3 x4 x5", "en", "web"),
      (5L, s"y1 y2 $passage y3 y4 y5", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact variant cuts real >=5-token duplicates and only those") {
    val dir = mkCorpus()
    val exact = Dedup.dedupSpanRemovalExact(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val approx = Dedup.dedupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // the genuine 6-token duplicate is cut by BOTH operators
    Seq(4L, 5L).foreach { id =>
      assert(exact(id)._2 == 6L, s"exact doc $id: ${exact(id)}")
      assert(approx(id)._2 == 6L, s"approx doc $id: ${approx(id)}")
      assert(!exact(id)._3.contains("q3"), exact(id)._3)
    }
    // the adjacent-4+4 boundary case: approximation merges the runs
    // and cuts 8 tokens; exact keeps them (max duplicate length 4)
    assert(approx(1L)._2 == 8L,
      s"approx should cut the merged 8-token run: ${approx(1L)}")
    assert(exact(1L)._2 == 0L,
      s"exact must not cut without a >=5-token duplicate: ${exact(1L)}")
    assert(exact(1L)._3.startsWith("pa1 pa2 pa3 pa4 pb1"), exact(1L)._3)
    // the phrases in their unique contexts survive under both
    Seq(2L, 3L).foreach { id =>
      assert(exact(id)._2 == 0L, s"exact doc $id: ${exact(id)}")
      assert(approx(id)._2 == 0L, s"approx doc $id: ${approx(id)}")
    }
  }
}
