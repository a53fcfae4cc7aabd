package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * sanctioned-by-convention way for extension libraries to wrap a custom
  * Catalyst Expression as a user-facing Column on Spark 4 (Column itself
  * only exposes ColumnNode). Kept to two one-liners. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
