package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for Spark internals that are `private[sql]` in 4.x: wrapping a
  * custom Catalyst Expression as a user-facing Column. Lives inside the
  * `org.apache.spark.sql` namespace solely for access; the engine's own
  * code stays under `graft`.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
