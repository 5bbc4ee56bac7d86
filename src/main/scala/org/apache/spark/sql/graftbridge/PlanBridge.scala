package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Logical-plan bridge for Spark 4: `Dataset.ofRows` (frame over an
  * arbitrary logical plan) is `private[sql]`. The SQL DML rules need
  * it twice — to hand a MERGE statement's already-analyzed SOURCE
  * subplan to the clause engine as a `DataFrame`, and to project a
  * source-side key expression (exprId-consistent with its subplan)
  * for merge candidate pruning. Same escape-hatch shape as
  * [[ColumnBridge]]/[[StreamBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
