package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's sql-private Column↔Expression converters for the
  * graft engine's custom Catalyst expressions. Spark 4 routes Column
  * construction through the classic ColumnNode converter, whose helpers
  * are private[sql]; extensions conventionally expose them from inside
  * the package.
  */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
