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

  /** Register a temp SQL function into an ALREADY-RUNNING session
    * (session-builder extensions only apply at SparkContext creation;
    * this is the live-session path the tests and notebooks use).
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
