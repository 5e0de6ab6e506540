package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("redaction scrubs every PII class and counts matches on the raw text") {
    val s = spark; import s.implicits._
    // the synthetic corpus carries no PII, so the email/phone/ip
    // classes are exercised here with crafted documents
    val docs = Seq(
      (0L, "contact bob.smith+spam@mail.example.org or sue@ex.io today"),
      (1L, "call 555-123-4567 then 555-000-1111 from host 10.0.255.3"),
      (2L, "the customer met a supplier about a vector of plain words"),
      (3L, "customer email customer@shop.com and ip 192.168.0.1"),
      (4L, "nothing sensitive here at all"))
    val dir = Files.createTempDirectory("graft-redact").toString
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("s0").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textRedact(s, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows(0L) == ("contact [EMAIL] or [EMAIL] today", 2L, 0L, 0L, 0L))
    assert(rows(1L) == ("call [PHONE] then [PHONE] from host [IP]", 0L, 2L, 1L, 0L))
    assert(rows(2L) == ("the [TERM] met a [TERM] about a [TERM] of plain words",
      0L, 0L, 0L, 3L))
    // counts are per-class over the RAW text: "customer@shop.com"
    // counts as an email AND contains the blocklist term, but the
    // email replacement wins in the cleaned text (class order)
    assert(rows(3L) == ("[TERM] email [EMAIL] and ip [IP]", 1L, 0L, 1L, 2L))
    assert(rows(4L) == ("nothing sensitive here at all", 0L, 0L, 0L, 0L))
  }

  test("char entropy separates degenerate text from prose") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "a" * 200),                       // mono-char: entropy 0
      (1L, "ababababab" * 20),               // two-symbol: entropy 1 bit = ln 2
      (2L, "the quick brown fox jumps over the lazy dog and then " +
        "seventeen astronauts calibrate twelve bright telescopes"))
    val dir = Files.createTempDirectory("graft-entropy").toString
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("s0").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textEntropy(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows(0L) == ((1L, 1.0, 0.0)))
    assert(rows(1L)._1 == 2L)
    assert(math.abs(rows(1L)._3 - math.log(2)) < 1e-5, rows(1L).toString)
    // prose: many symbols, no dominant char, entropy well above 2 nats
    assert(rows(2L)._1 > 15L && rows(2L)._2 < 0.25 && rows(2L)._3 > 2.0)
  }

  test("BM25 ranks by idf, saturates tf, and normalizes by length") {
    val s = spark; import s.implicits._
    // crafted corpus for query 1 = "customer query": "customer" is
    // COMMON (df high → low idf), "query" is RARE (df low → high idf)
    val filler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val docs = Seq(
      (1L, "customer query " + "pad " * 3),            // both terms, short
      (2L, "customer query " + "pad " * 120),          // both terms, long
      (3L, ("customer " * 10) + "pad pad"),            // one common term, tf 10
      (4L, "query " + filler),                         // rare term only
      (5L, "customer " + filler)) ++                   // common term only
      // background docs that make "customer" common corpus-wide
      (6L to 15L).map(i => (i, s"customer number $i " + filler))
    val dir = Files.createTempDirectory("graft-bm25").toString
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("s0").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q1 = TextAnalysis.textBm25Search(s, dir).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getLong(2) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    def rank(d: Long) = q1(d)._1
    def score(d: Long) = q1(d)._2
    // the short both-terms doc is the best match outright
    assert(rank(1L) == 1L, q1.toString)
    // length normalization: same tf of both terms, the 120-pad copy
    // scores a fraction of the short one (and can even fall below the
    // short rare-term-only doc — correct BM25 behavior)
    assert(score(1L) > 3.0 * score(2L))
    // idf: the rare term alone outranks the common term alone AND the
    // common term repeated 10 times (tf saturation caps doc 3)
    assert(score(4L) > score(5L) && score(4L) > score(3L))
    // saturation: tf=10 of "customer" is worth far less than 10x tf=1
    assert(score(3L) < 10.0 * score(5L))
  }
}
