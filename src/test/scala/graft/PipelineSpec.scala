package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Pipeline, TextAnalysis}

class PipelineSpec extends SparkSpec {

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
}
