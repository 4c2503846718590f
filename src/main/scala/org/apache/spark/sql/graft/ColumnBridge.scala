package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ⇄ Expression conversion —
  * the supported extension-point pattern for libraries that add native
  * Catalyst expressions (Spark 4 unified `Column` around ColumnNode, so
  * the old `new Column(expr)` / `col.expr` are no longer public). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
