package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's package-private Column<->Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose custom Catalyst expressions as user-facing Columns in Spark 4.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
