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
