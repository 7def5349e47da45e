package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column↔Expression converters, for graft's
  * native expressions that carry non-literal state (PQ codebooks) and
  * therefore can't go through the FunctionRegistry path that
  * [[graft.expressions.GraftFunctions]] uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
