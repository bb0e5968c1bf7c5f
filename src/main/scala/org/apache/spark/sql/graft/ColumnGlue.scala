package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression conversion for graft's native
  * expressions. The converters are `private[sql]` in Spark 4, so this
  * one-file glue lives in the sql package namespace; everything else of
  * graft stays in its own packages. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Force driver-side StateStoreCoordinator registration. A streaming
    * query does this on start, but a BATCH `transformWithState` plan
    * reaches straight for the coordinator endpoint and fails with
    * RpcEndpointNotFoundException if nothing registered it — touching
    * the query manager's lazy ref (private[sql] surface, hence glue)
    * makes batch execution of the arbitrary-state operator self
    * -contained. Idempotent and cheap after the first call. */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.streamingQueryManager.stateStoreCoordinator
}
