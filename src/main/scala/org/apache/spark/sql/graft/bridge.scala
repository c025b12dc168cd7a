package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for Spark 4's decoupled Column API
  * (since 4.0 a Column wraps a ColumnNode, not an Expression, and the
  * conversion helpers are `private[sql]` — hence this package-scoped shim,
  * the standard pattern for Spark extension libraries).
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Stop streaming state-store maintenance threads while the RpcEnv is
    * still alive. Without this, a maintenance tick racing `spark.stop()`
    * logs an RpcEnvStoppedException stack trace to stderr during JVM
    * shutdown — harmless but noisy enough to drown a process's final
    * stdout in log-scraping harnesses. `StateStore.stop()` is
    * `private[sql]`, hence routed through this package-scoped shim. */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()

  /** Fork a session that INHERITS the parent's state — temp views, SQL
    * conf, registered functions — but isolates everything registered
    * afterwards (`SparkSession.cloneSession()` is `private[sql]`). Unlike
    * `newSession()`, whose empty temp-view catalog breaks any SQL that
    * references the caller's other views. */
  def cloneSession(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Wrap a hand-built LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]` in Spark 4's classic module) — the construction path
    * for custom logical operators like [[graft.plans.TopK]]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
