package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor (Columns
  * now wrap ColumnNodes for Connect compatibility); the classic
  * converter lives behind `private[sql]`. This bridge re-exports the
  * two conversions custom Catalyst expressions need. Same pattern any
  * third-party Spark extension library uses. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
