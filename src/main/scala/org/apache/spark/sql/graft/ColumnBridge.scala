package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression and plan↔Dataset
  * conversions (Spark 4 hid `Column.expr` and `Dataset.ofRows` behind the
  * Connect-unified API). Lives in the org.apache.spark.sql package
  * namespace solely to satisfy the access modifier; used by graft's
  * custom Catalyst expressions and plan nodes.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column (incl. `.desc`/`.asc` sort columns) to a
    * pure catalyst expression. `expression()` returns a lazy
    * ColumnNodeExpression wrapper for sort order, whose embedded internal
    * nodes are not Java-serializable and explode inside task closures.
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
