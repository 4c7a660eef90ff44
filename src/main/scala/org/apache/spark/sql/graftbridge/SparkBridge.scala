package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed `new Column(expr)`; the supported bridge
  * (`o.a.s.sql.classic.ExpressionUtils`) is `private[sql]`, so this
  * one-file shim lives under the `org.apache.spark.sql` package to
  * re-export the two conversions graft's custom expressions need.
  * Pattern used by every Spark extension library that ships custom
  * Catalyst expressions against Spark 4 (e.g. delta-io/delta's
  * `org.apache.spark.sql.delta` package placement — public source).
  */
object SparkBridge {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for wrapping it in a
    * custom logical operator with already-resolved attributes).
    */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** `Dataset.ofRows` — the constructor for a DataFrame over a custom
    * logical plan (private[sql] in Spark 4, like the Column bridge).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
