package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column ⇄ Catalyst-Expression bridge for Spark 4's split Column API
  * (`Column.expr` moved behind `sql.classic.ExpressionUtils`). */
package object rdf {
  private[graft] def toExpr(c: Column): Expression = ColumnBridge.toExpr(c)
  private[graft] def toColumn(e: Expression): Column = ColumnBridge.toColumn(e)

  /** Full sha1 hex of a string — the shared collision-free id derivation
    * (32-bit hashCode collides at ~77k values by the birthday bound,
    * which both blank-node labels and per-task output dirs exceed). */
  private[graft] def sha1Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
}
