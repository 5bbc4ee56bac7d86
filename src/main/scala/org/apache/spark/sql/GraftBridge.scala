package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion —
  * the supported extension-point shape for libraries that define
  * custom Catalyst expressions (same mechanism
  * `org.apache.spark.sql.classic.ExpressionUtils` uses internally).
  */
object GraftBridge {
  def column(e: Expression): Column = graftbridge.ColumnBridge.toColumn(e)

  /** Delegates to [[graftbridge.ColumnBridge.toExpression]] — the
    * EAGER node→expression conversion. The lazy
    * `ExpressionUtils.expression` wraps in a `ColumnNodeExpression`
    * that is fine inside normal plans but dies in codegen when
    * returned from a FunctionRegistry builder; one implementation
    * means no caller can reintroduce that split. */
  def expression(c: Column): Expression = graftbridge.ColumnBridge.toExpression(c)
}
