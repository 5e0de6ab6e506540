package graft

import graft.operators.TextAnalysis

/** The engine's second API surface: everything reachable from the
  * DataFrame DSL must also work through plain `spark.sql` — temp
  * views over the loaders plus the session-registered graft_*
  * functions. A SQL-first consumer (BI tool, notebook, dbt-style
  * pipeline) never touches the Scala API. */
class SqlSurfaceSpec extends SparkSpec {

  test("native graft functions and analytics compose in pure SQL") {
    val s = spark
    graft.sources.Tables.documents(s, sfDir).createOrReplaceTempView("documents_v")
    val viaSql = s.sql(
      """SELECT doc_id,
        |  graft_fingerprint(split(trim(text), '\\s+')) AS fingerprint,
        |  graft_simhash64(split(trim(text), '\\s+')) AS simhash
        |FROM documents_v ORDER BY doc_id""".stripMargin).collect()
    val viaDsl = TextAnalysis.textFingerprint(s, sfDir).collect()
    assert(viaSql.length == viaDsl.length && viaSql.nonEmpty)
    val sqlFp = viaSql.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dslFp = viaDsl.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlFp == dslFp, "SQL and DSL fingerprints must agree")
  }

  test("graft_entropy is callable from pure SQL and matches the DSL path") {
    val s = spark
    graft.sources.Tables.documents(s, sfDir).createOrReplaceTempView("documents_v")
    val viaSql = s.sql(
      "SELECT doc_id, graft_entropy(text) AS e FROM documents_v ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaDsl = {
      import s.implicits._
      graft.sources.Tables.documents(s, sfDir)
        .select($"doc_id", org.apache.spark.sql.functions.expr("graft_entropy(text)").as("e"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    }
    assert(viaSql.nonEmpty && viaSql == viaDsl)
  }

  test("the bloom pair round-trips through pure SQL with no false negatives") {
    val s = spark
    graft.sources.Tables.supplier(s, sfDir).createOrReplaceTempView("supplier_v")
    // build the filter in SQL (aggregate), ship it back as a bound
    // parameter — parameter binding folds to a literal, satisfying
    // might_contain's foldable-bloom requirement
    val bloom = s.sql(
      "SELECT graft_bloom_agg(xxhash64(s_suppkey), 100000L, 800000L) AS b FROM supplier_v")
      .head().getAs[Array[Byte]](0)
    val misses = s.sql(
      "SELECT count(*) AS n FROM supplier_v WHERE NOT graft_might_contain(:bloom, xxhash64(s_suppkey))",
      Map("bloom" -> bloom)).head().getLong(0)
    assert(misses == 0L, s"a bloom filter must have no false negatives, got $misses")
  }

  test("a windowed analytic over a view matches the DSL result") {
    val s = spark
    graft.sources.Tables.events(s, sfDir).createOrReplaceTempView("events_v")
    val sql = s.sql(
      """SELECT user_id, count(*) AS n
        |FROM events_v GROUP BY user_id ORDER BY user_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dsl = {
      import s.implicits._
      graft.sources.Tables.events(s, sfDir)
        .groupBy($"user_id").count().orderBy($"user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(sql == dsl && sql.nonEmpty)
  }
}
