package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-session bridge for custom Catalyst expressions.
  *
  * Spark 4's public `Column` no longer wraps a catalyst `Expression` (the
  * Connect-compatible Column API), and the conversion helpers
  * (`classic.ExpressionUtils`) are `private[sql]`. Extension libraries that
  * ship native expressions host a shim inside `org.apache.spark.sql` to reach
  * them — this is the whole file's job; nothing else may live here.
  */
package object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER column-node → catalyst conversion. [[expression]] wraps the
    * Column's node in a lazy `ColumnNodeExpression`, which only converts
    * when the analyzer meets it at a Dataset plan boundary — returned from a
    * registered FUNCTION BUILDER it would survive into the physical plan
    * unresolved (Unevaluable → INTERNAL_ERROR at codegen). This converts
    * immediately; any `UnresolvedFunction`s inside the result are ordinary
    * catalyst nodes the analyzer's fixpoint then resolves. */
  def expressionNow(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
