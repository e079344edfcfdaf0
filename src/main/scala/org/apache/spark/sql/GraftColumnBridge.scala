package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's ColumnNode-backed `Column`: the classic
  * Column↔Expression converters are `private[sql]`, so extension
  * libraries expose them through a same-package shim (the standard
  * pattern for custom-Expression libraries on Spark 4).
  */
object GraftColumnBridge {
  def toExpr(c: Column): Expression   = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
