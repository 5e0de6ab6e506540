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
}
