package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Bpe, Unigram}

/** Plan contract for the tokenizer-encode lexicon joins after the
  * round-11 broadcast de-risk: the distinct-word lexicon is
  * Heaps-bounded — tiny at test SF, 10⁸–10⁹ rows on web-scale text —
  * so NO site may carry a hardcoded `broadcast()` hint (a hint
  * doesn't degrade, it OOMs). Instead the lexicon is a STAGED
  * parquet artifact whose true size the planner reads:
  *   - while it fits the auto-broadcast threshold, the planner picks
  *     broadcast-hash-join on its own (asserted here), and
  *   - past the threshold the SAME plan degrades to a shuffled join
  *     instead of falling over (asserted by forcing the threshold to
  *     -1 — the "large lexicon" limit in plan-shape form).
  */
class TokenizerPlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withThreshold[A](v: String)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  test("unigram encode: planner broadcasts the staged lexicon unhinted") {
    val p = plan(Unigram.tokenIdsUnigram(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"staged lexicon should auto-broadcast at test SF:\n$p")
  }

  test("bpe encode: planner broadcasts the staged lexicon unhinted") {
    val p = plan(Bpe.tokenIdsBpe(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"staged lexicon should auto-broadcast at test SF:\n$p")
  }

  test("a too-large lexicon degrades to a shuffled join, not an OOM") {
    // threshold -1 == "nothing fits in a broadcast": exactly the
    // plan the engine must fall back to when the lexicon outgrows
    // the driver — a shuffled equi-join on tok, no broadcast node
    withThreshold("-1") {
      val p = plan(Unigram.tokenIdsUnigram(spark, sfDir))
      assert(!p.contains("BroadcastHashJoin"),
        s"hint must not force a broadcast once the planner says no:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"large-lexicon fallback must be a shuffled equi-join:\n$p")
    }
  }

  test("fertility and sweep lexicon joins carry no broadcast hint either") {
    withThreshold("-1") {
      Seq(
        "tokenizer_fertility" -> Unigram.tokenizerFertility(spark, sfDir),
        "tokenizer_vocab_sweep" -> Unigram.tokenizerVocabSweep(spark, sfDir),
        "bpe_fertility" -> Bpe.bpeFertility(spark, sfDir)
      ).foreach { case (name, df) =>
        val p = plan(df)
        assert(!p.contains("BroadcastHashJoin"),
          s"$name still forces a broadcast under threshold -1:\n$p")
      }
    }
  }
}
