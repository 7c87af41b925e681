package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 made these conversions `private[sql]` (Column wraps a
  * ColumnNode, not an Expression), so the shim lives in the
  * `org.apache.spark.sql` package — the standard extension-library
  * technique for exposing a custom `Expression` as a user-facing
  * `Column`.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
