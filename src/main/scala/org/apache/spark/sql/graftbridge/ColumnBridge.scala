/* Lives in the org.apache.spark.sql namespace solely to reach the
 * `private[sql]` Column ⇄ Expression converters that Spark 4 moved out of
 * the public Column API (`org.apache.spark.sql.classic.ExpressionUtils`).
 * Standard extension-library pattern; no Spark internals are modified. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
