package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion (the
  * Spark 4 Column is backed by ColumnNodes, not Expressions). Lives under
  * the org.apache.spark.sql package solely to satisfy the access
  * qualifier — the standard pattern for Catalyst extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (private[sql] surface). */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Build a DataFrame over a custom LogicalPlan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Replay a SparkSessionExtensions' injected functions into a registry
    * (private[sql] surface) — lets a spec assert the extension hook's
    * registration set without constructing a new session.
    */
  def extensionFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** The planner strategies a SparkSessionExtensions would inject. */
  def extensionStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** The Catalyst aggregate expression behind a typed Aggregator UDAF —
    * what UDFRegistration builds for `spark.udf.register(name, udaf)`,
    * exposed so the function-registry/extension path can register typed
    * aggregates (slope_origin) alongside the native expression family.
    */
  def scalaAggregator(
      udf: org.apache.spark.sql.expressions.UserDefinedFunction,
      children: Seq[Expression]): Expression =
    org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      // functions.udaf always returns a UserDefinedAggregator (itself
      // private[sql], hence the bridge-side cast)
      udf.asInstanceOf[
        org.apache.spark.sql.expressions.UserDefinedAggregator[Any, Any, Any]],
      children)
}
