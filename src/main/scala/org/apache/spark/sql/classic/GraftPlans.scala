package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal shim into the classic session: `Dataset.ofRows` is
  * private[sql], and building a DataFrame from a custom LogicalPlan
  * (graft.plans.TopKPerGroupNode) needs it. This is the standard
  * extension-library pattern for attaching custom logical nodes. */
object GraftPlans {
  def ofRows(session: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(session.asInstanceOf[SparkSession], plan)

  /** Frees the RDD blocks behind a `localCheckpoint(true)`'d frame.
    * `Dataset.unpersist` only clears CacheManager entries; a local
    * checkpoint is RDD-level storage referenced by a LogicalRDD leaf,
    * which must be unpersisted directly or it lingers until GC. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
