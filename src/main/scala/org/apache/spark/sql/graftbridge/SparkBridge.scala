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
}
