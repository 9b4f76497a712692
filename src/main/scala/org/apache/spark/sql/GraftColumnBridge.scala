package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters so graft's
  * custom Catalyst expressions can surface as user-facing Columns
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils holds
  * the Expression adapters but is private[sql]).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
