package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ↔ Column conversion for this library's native Catalyst
  * expressions (graft.functions). Spark 4 moved these converters
  * behind `private[sql]` (`classic.ExpressionUtils`), so — the
  * standard pattern for Spark extension libraries — this one-file
  * bridge lives in the `org.apache.spark.sql` package and re-exports
  * exactly the two calls needed. No Spark internals are modified.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
