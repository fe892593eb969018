package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst [[Expression]]s and the public [[Column]]
  * API (Spark 4 hides the Expression-backed Column constructor behind
  * `private[sql]`). Lives under `org.apache.spark.sql` solely for access;
  * contains no logic.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
