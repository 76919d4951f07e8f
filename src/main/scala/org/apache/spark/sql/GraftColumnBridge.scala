package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Expression ↔ Column converters
  * (org.apache.spark.sql.classic.ExpressionUtils), needed to expose custom
  * Catalyst expressions (e.g. graft.functions.RollingHash) as user-facing
  * Columns on Spark 4's Column-node API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
