package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session memo for expensive ANN-tier RESULTS (50-row frames), the
  * device `ann_recall_report` uses to re-invoke every registered tier
  * without re-paying their scans: a STANDALONE tier invocation always
  * computes live and [[refresh]]es its entry (so each bench pass
  * times the real scan — the round-10 ADVICE rule that killed the
  * staged-final-answer shortcut), while the report reads the last
  * computed frame through [[cached]], falling back to the live path
  * when the tier hasn't run this session. Results are lineage-cut
  * (eager localCheckpoint of a bounded frame), never written to disk,
  * never read by any oracle. */
object TierMemo {

  // IMMUTABLE-DATASET ASSUMPTION: entries are keyed (name, dir,
  // session) and never expire — correct because a dataset dir is
  // immutable for the life of a session (the library's ingest paths
  // write to catalog tables and staging dirs, never INTO a dataset
  // dir). A writer that does mutate a dataset in place must call
  // invalidate() so reports re-score against the new data instead of
  // a stale checkpointed frame (entries also pin their session's
  // checkpoint blocks until then).
  private val m =
    scala.collection.concurrent.TrieMap[(String, String, SparkSession), DataFrame]()

  /** Drop every memoized tier result for `dir` — the hook an in-place
    * dataset writer calls (no writer in this library needs it today;
    * see the immutability note above). */
  def invalidate(dir: String): Unit =
    m.keys.filter(_._2 == dir).foreach(m.remove)

  /** Standalone path: evaluate the frame now, remember it. */
  def refresh(name: String, dir: String, s: SparkSession)(df: => DataFrame): DataFrame = {
    val d = df.localCheckpoint(true)
    m.put((name, dir, s), d)
    d
  }

  /** Report path: last computed frame if present, else `fallback`
    * (which, being the registered tier function, refreshes). */
  def cached(name: String, dir: String, s: SparkSession)(fallback: => DataFrame): DataFrame =
    m.get((name, dir, s)).getOrElse(fallback)
}
