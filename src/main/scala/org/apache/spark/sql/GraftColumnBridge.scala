package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package scope: Column <-> catalyst Expression
  * conversions for wiring custom expressions into the public Column API
  * (the classic ExpressionUtils helpers are private[sql] in Spark 4). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
