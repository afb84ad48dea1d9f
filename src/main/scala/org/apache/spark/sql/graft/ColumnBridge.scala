package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters, the
  * supported pattern for libraries shipping native Catalyst expressions
  * (same approach as other Spark-extension projects). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access
  * qualifier; keep it minimal.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an already-analyzed logical subplan — used by the
    * registry-wide sort-key lint to re-query a `Window` node's INPUT
    * (child) with the window's own resolved key expressions.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
