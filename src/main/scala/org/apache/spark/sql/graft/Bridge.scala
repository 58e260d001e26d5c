package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place that touches `private[sql]` surface: constructing a
  * DataFrame from a hand-built logical plan. Lives under
  * `org.apache.spark.sql` for access; keep it to this single method so
  * the engine's dependence on non-public API stays auditable. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
