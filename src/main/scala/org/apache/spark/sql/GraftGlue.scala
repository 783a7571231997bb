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

  /** Wrap a (resolved) logical plan as a DataFrame — the door optimizer
    * rules use to rebuild a subtree with the public Dataset API instead
    * of hand-assembling catalyst nodes. `private[sql]` in Spark, hence
    * surfaced here.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed (resolved) logical plan of a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Register a function builder on an ALREADY-RUNNING session (the
    * config-time path is `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerRuntimeFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
