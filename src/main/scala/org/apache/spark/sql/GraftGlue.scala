package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. `classic.ExpressionUtils` is `private[sql]`, so the
  * (two-line) accessor lives in this package — the same pattern Spark
  * extension libraries (e.g. spark-daria, frameless) use.
  */
object GraftGlue {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Spark's standard WRONG_NUM_ARGS AnalysisException (the thrower is
    * `private[sql]`, hence surfaced here).
    */
  def wrongNumArgs(fn: String, expected: Int, actual: Int): Throwable =
    errors.QueryCompilationErrors.wrongNumArgsError(fn, Seq(expected), actual)

  /** Register a function builder on an ALREADY-RUNNING session (the
    * config-time path is `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerRuntimeFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
