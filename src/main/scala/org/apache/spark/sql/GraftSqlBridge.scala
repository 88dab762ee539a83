package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's private[sql] Column <-> Expression converters, so
  * graft's custom Catalyst expressions can surface as user-facing Columns.
  * (In Spark 4 a Column wraps a ColumnNode, not an Expression; the official
  * converter lives in `org.apache.spark.sql.classic.ExpressionUtils`.)
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
