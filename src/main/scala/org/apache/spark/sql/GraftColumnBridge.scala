package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the sql package scope: Column <-> catalyst Expression
  * conversions for wiring custom expressions into the public Column API,
  * and LogicalPlan -> DataFrame for wiring custom logical operators
  * (the classic ExpressionUtils / Dataset.ofRows helpers are
  * private[sql] in Spark 4). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
