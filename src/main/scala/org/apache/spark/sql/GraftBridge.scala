package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion —
  * the supported extension-point shape for libraries that define
  * custom Catalyst expressions (same mechanism
  * `org.apache.spark.sql.classic.ExpressionUtils` uses internally).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
