package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column↔Expression converters (Spark 4's
  * Column wraps a ColumnNode, not a catalyst Expression). Lives in the
  * org.apache.spark.sql namespace solely for visibility; the engine's
  * own code is all under `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
