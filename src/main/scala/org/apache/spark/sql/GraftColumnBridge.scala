package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so libraries adding native expressions expose it from
  * inside the package — the same pattern Spark-extension libraries use.
  * Kept to exactly these two forwarders. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
