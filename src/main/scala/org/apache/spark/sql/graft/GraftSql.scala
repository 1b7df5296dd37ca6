package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{classic, DataFrame, SparkSession}

/** Bridge to `Dataset.ofRows` (which is `private[sql]`): builds a
  * DataFrame from a raw `LogicalPlan`, letting graft register custom
  * logical operators (e.g. the as-of join) that run through the normal
  * analyzer → optimizer → planner pipeline. Lives under
  * `org.apache.spark.sql` solely for that visibility — the standard
  * pattern for Spark extension libraries that add whole operators.
  */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
