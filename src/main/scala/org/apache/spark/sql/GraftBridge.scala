package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * standard pattern OSS Spark extension libraries use to expose native
  * Catalyst expressions through the Column API (Spark 4 removed the
  * public `new Column(expr)` constructor).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Proper WRONG_NUM_ARGS AnalysisException for injected SQL functions
    * (the error-class factory lives in `private[sql]`
    * QueryCompilationErrors).
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Throwable =
    errors.QueryCompilationErrors.wrongNumArgsError(
      name, Seq(expected), actual)
}
