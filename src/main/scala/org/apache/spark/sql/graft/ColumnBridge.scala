package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** `ExpressionUtils` is private[sql]; this bridge (inside the sql package
  * namespace, the standard pattern for Spark extension libraries) exposes
  * the Column ↔ Expression conversions graft's custom Catalyst
  * expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
