package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression converters (Spark 4's
  * Column wraps a ColumnNode; `classic.ExpressionUtils` is `private[sql]`).
  * This is the supported pattern for libraries registering custom Catalyst
  * expressions without going through the SQL function registry.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame — the library
    * entry point for custom LogicalPlan nodes (`classic.Dataset.ofRows` is
    * `private[sql]`). */
  def dataset(spark: SparkSession,
              plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The session's experimental-methods hook (extraStrategies /
    * extraOptimizations) — a classic-only surface. */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental

  /** Session-aware EAGER Column → catalyst Expression conversion. Unlike
    * [[expression]], which wraps the column node lazily (fine inside a plan
    * the analyzer will rewrite), this runs the classic converter NOW — what
    * custom logical nodes need, since a lazy ColumnNodeExpression buried in
    * their constructor args survives to the executor closure unconverted
    * (and is not serializable). */
  def catalystExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
