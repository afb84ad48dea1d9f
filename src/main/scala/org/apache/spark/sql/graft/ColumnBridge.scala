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
}
