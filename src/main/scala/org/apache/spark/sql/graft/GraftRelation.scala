package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-method bridge from a graft-built [[LogicalPlan]] to a user
  * [[DataFrame]].
  *
  * `Dataset.ofRows` is `private[sql]` — Spark deliberately keeps plan
  * construction out of the public surface — so libraries that add whole
  * logical operators (graft's [[graft.plans.AsOfJoin]]) place one shim
  * inside the `org.apache.spark.sql` package hierarchy to reach it. This
  * file is that shim and nothing else: no Spark internals are re-exported,
  * and every other graft source stays in the `graft` package.
  */
object GraftRelation {

  /** Wrap a resolved logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Append a planner strategy to an existing session (idempotent) — the
    * runtime twin of `SparkSessionExtensions.injectPlannerStrategy` for
    * sessions (like the driver harness's) built without graft extensions.
    */
  def ensureStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
