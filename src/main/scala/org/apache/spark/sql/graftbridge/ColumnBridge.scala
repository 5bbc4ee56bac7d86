package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for Spark 4, where `Column` wraps a
  * `ColumnNode` and the converters (`classic.ExpressionUtils`) are
  * `private[sql]`. Living one package under `org.apache.spark.sql`
  * is the established third-party-library escape hatch (Delta,
  * frameless, spark-nlp all ship one); the engine uses it ONLY to
  * register Column-built composite functions (canonical_url,
  * registrable_domain) in [[graft.GraftExtensions]] so the SQL
  * surface shares the exact expression tree of the DataFrame path. */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER ColumnNode -> Expression conversion. `ExpressionUtils
    * .expression` wraps lazily in a `ColumnNodeExpression` whose
    * unresolved children the analyzer does not recurse into when the
    * tree is returned from a FunctionRegistry builder (codegen then
    * dies on the unresolved wrapper); the converter lowers the whole
    * node tree to plain catalyst expressions up front. */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
