package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters in Spark 4's
  * classic API (`org.apache.spark.sql.classic.ExpressionUtils`) — needed to
  * wrap a custom Catalyst [[Expression]] as a user-facing [[Column]] without
  * going through the function registry. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
