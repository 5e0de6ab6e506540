package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal shim into the classic session: `Dataset.ofRows` is
  * private[sql], and building a DataFrame from a custom LogicalPlan
  * (graft.plans.TopKPerGroupNode) needs it. This is the standard
  * extension-library pattern for attaching custom logical nodes. */
object GraftPlans {
  def ofRows(session: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(session.asInstanceOf[SparkSession], plan)
}
