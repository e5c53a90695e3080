package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark surface: Column <-> catalyst
  * Expression, and the session SQL parser. Lives under
  * `org.apache.spark.sql` solely for access; everything else in this
  * project is under `graft`.
  */
object SparkInternals {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Parse a SQL (named) expression string into an unresolved Expression. */
  def parseExpression(spark: SparkSession, sql: String): Expression =
    spark.sessionState.sqlParser.parseExpression(sql)
}
