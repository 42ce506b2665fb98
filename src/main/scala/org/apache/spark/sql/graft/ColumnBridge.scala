package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression conversions for the classic (non-Connect)
  * API. Spark 4 made these `private[sql]` (`ExpressionUtils`), so the engine
  * reaches them from a subpackage — the standard extension-library pattern
  * for building typed Columns around custom expressions without forcing
  * every call site through the SQL function registry. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
