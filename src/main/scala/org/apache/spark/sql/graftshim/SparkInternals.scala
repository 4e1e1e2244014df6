package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal interop shim for two `private[sql]` constructors the MERGE
  * SQL front-end needs: Column-from-Expression and
  * DataFrame-from-LogicalPlan. Lives under `org.apache.spark.sql` for
  * access — the standard pattern Spark-ecosystem table formats use for
  * the same purpose. Nothing else from internals is touched; both
  * functions are thin delegations pinned to the Spark 4.1 classic API.
  */
object SparkInternals {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
