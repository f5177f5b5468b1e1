package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression converters (Spark 4's
  * Column wraps a ColumnNode; `classic.ExpressionUtils` is `private[sql]`).
  * This is the supported pattern for libraries registering custom Catalyst
  * expressions without going through the SQL function registry.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
