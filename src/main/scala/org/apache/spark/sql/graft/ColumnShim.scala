package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ⇄ Expression bridge.
  *
  * Spark 4 made the classic `Column(expr)` constructor and
  * `ExpressionUtils` `private[sql]` (the public `Column` is now a
  * connect-compatible node tree). Libraries that build custom Catalyst
  * expressions bridge through a one-file shim in the `org.apache.spark.sql`
  * namespace — the standard extension pattern (`private[sql]` grants
  * subpackage access). Everything here delegates to Spark's own
  * `classic.ExpressionUtils`; no behavior is added.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The column's literal value, if it IS a literal. Spark 4's public
    * `lit()` builds a lazy `internal.Literal` COLUMN NODE (converted to a
    * catalyst `Literal` only at analysis), so a plan-build-time check
    * must look at the node form too — matching only
    * `catalyst.expressions.Literal` silently misses every public-API
    * literal.
    */
  def literalValue(c: Column): Option[Any] = c.node match {
    case org.apache.spark.sql.internal.Literal(v, _, _) => Some(v)
    case _ => expression(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => Some(v)
      case _ => None
    }
  }
}
