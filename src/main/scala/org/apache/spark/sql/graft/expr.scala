package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ↔ catalyst Expression converters,
  * which are `private[sql]` in Spark 4 — the standard shim an
  * extension library needs to plan custom Expressions
  * (graft.functions.Kernels) without a FunctionRegistry round trip.
  */
object expr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
