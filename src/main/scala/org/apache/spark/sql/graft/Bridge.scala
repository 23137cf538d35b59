package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression surface,
  * placed in a subpackage of `org.apache.spark.sql` for access — the
  * standard pattern for libraries shipping native Catalyst expressions
  * (the public Column API intentionally hides Expression in Spark 4).
  * Keep this file to conversions only; all expression logic lives in
  * `graft.functions`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (classic Dataset.ofRows is
    * `private[sql]`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Runtime strategy registration point (classic-only surface). */
  def experimental(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.ExperimentalMethods =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental

  /** Apply a SparkSessionExtensions' injected functions to a registry —
    * what the session builder does at build time; exposed so specs can
    * verify injection without constructing a new SparkContext. */
  def registerFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
                        registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** Materialize a SparkSessionExtensions' injected planner strategies —
    * what session-state building does; exposed so specs can verify
    * strategy injection without constructing a new SparkContext. */
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
                        spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)
}
