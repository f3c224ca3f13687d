package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's native Catalyst expressions.
  * Spark 4 abstracts `Column` away from catalyst for Connect, so wrapping a
  * raw `Expression` goes through the classic-session utilities; those are
  * `private[sql]`, hence this one-file shim inside the sql package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
