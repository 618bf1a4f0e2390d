package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to a user-facing [[Column]].
  *
  * Spark 4 made `Column(expr)` private[sql] (Columns wrap ColumnNodes for
  * Connect compatibility); `ExpressionUtils.column` is the supported internal
  * conversion. This one-liner lives in the org.apache.spark.sql package only
  * to cross that access boundary — everything graft-specific stays in graft.*.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
