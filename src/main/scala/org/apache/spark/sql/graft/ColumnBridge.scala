package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column<->Expression conversion for
  * registering custom Catalyst expressions as user-facing Columns
  * (Spark 4 removed the public `new Column(expr)` constructor; this is
  * the supported classic-API conversion point, accessed from an
  * org.apache.spark.sql subpackage). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
