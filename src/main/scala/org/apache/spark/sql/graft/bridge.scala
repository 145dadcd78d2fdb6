package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst Expressions and the public Column API.
  *
  * Spark 4 routes Column through ColumnNode; `ExpressionUtils.column` is the
  * supported classic-API conversion but is `private[sql]`, so this one-file
  * shim lives under `org.apache.spark.sql`. No Spark internals are modified.
  */
object bridge {
  def exprColumn(e: Expression): Column = ExpressionUtils.column(e)
  def columnExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
