package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Column/Dataset internals
  * so the library can lift its native Catalyst expressions
  * (graft.functions.{FloatVecDot, MinHashMd5Sigs, SimHash64,
  * MinShingleMd5}) into `Column`s and its custom logical plans
  * (graft.plans.AsOfJoinNode) into `DataFrame`s. This is the same
  * mechanism `functions.expr` / `Dataset.ofRows` use internally; no
  * behavior lives here.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def dataset(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
