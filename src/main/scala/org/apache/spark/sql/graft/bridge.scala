package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for Spark 4's decoupled Column API
  * (since 4.0 a Column wraps a ColumnNode, not an Expression, and the
  * conversion helpers are `private[sql]` — hence this package-scoped shim,
  * the standard pattern for Spark extension libraries).
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
