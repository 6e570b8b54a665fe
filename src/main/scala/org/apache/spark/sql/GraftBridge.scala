package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression converters — the
  * documented pattern for libraries shipping custom Catalyst expressions
  * (Spark keeps these internal since the Connect split in 4.x). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** LogicalPlan → DataFrame — for rules applied EXPLICITLY to one query's
    * analyzed plan (graft.plans.MvRewrite) rather than injected session-wide:
    * the rewritten plan re-enters the session through the same door the
    * DataFrame API uses. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
