package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge exposing Spark's private[sql] Expression ↔ Column conversions to the
 * graft library (needed to wrap custom Catalyst expressions as user-facing
 * Columns in Spark 4's split Column/ColumnNode API).
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
