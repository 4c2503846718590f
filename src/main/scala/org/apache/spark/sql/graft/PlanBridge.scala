package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to Spark 4's `private[sql]` Dataset construction from a raw
  * logical plan — the extension point a library needs to surface its own
  * plan nodes (e.g. [[graft.plans.TopKPerGroup]]) as ordinary DataFrames.
  * Pattern-companion of [[ColumnBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** EAGER Column → catalyst Expression conversion via the session's
    * converter. [[ColumnBridge.expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that only normal Dataset operations
    * unwrap — inside a custom plan node it would survive to execution
    * unresolved (and is not even serializable). Custom nodes must
    * convert eagerly through this. */
  def expression(spark: SparkSession,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
