package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters so graft's
  * custom Catalyst expressions can be used as Columns without requiring
  * function registration. This is the standard extension-library pattern
  * (the converters are stable internal API used by every Spark connector).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Stable per-session identity STRING (`private[sql] sessionUUID`) — lets
    * library caches key on a string instead of retaining the session object
    * (graft.Tables' leak fix, ADVICE r18). */
  def sessionUUID(spark: SparkSession): Option[String] = spark match {
    case c: classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }
}
