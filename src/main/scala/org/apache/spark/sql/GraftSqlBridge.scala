package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column internals so the
  * library can lift its native Catalyst expressions
  * (graft.functions.{FloatVecDot, MinHashMd5Sigs, SimHash64,
  * MinShingleMd5}) into `Column`s. This is the same mechanism
  * `functions.expr` uses internally; no behavior lives here.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
