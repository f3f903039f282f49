package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column ⇄ Catalyst-Expression bridge for Spark 4's split Column API
  * (`Column.expr` moved behind `sql.classic.ExpressionUtils`). */
package object rdf {
  private[graft] def toExpr(c: Column): Expression = ColumnBridge.toExpr(c)
  private[graft] def toColumn(e: Expression): Column = ColumnBridge.toColumn(e)
}
