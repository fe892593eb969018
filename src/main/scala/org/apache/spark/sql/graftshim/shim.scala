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

  /** Drop the cached blocks of a localCheckpoint'ed Dataset NOW instead
    * of waiting for the async ContextCleaner (iterative graph loops
    * stack one ~|E|-sized block set per round; under a shared-JVM bench
    * the lag turns into storage-eviction churn billed to whatever query
    * runs next). No-op for plans that are not a checkpoint LogicalRDD.
    * Safe ONLY once nothing will scan the relation again — the lineage
    * was truncated, so the blocks are the only copy.
    */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
