package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 makes the Column<->Expression conversions `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * shipping native Catalyst expressions need exactly these two calls, so
  * this shim re-exports them from inside the sql package — the standard
  * pattern for out-of-tree Spark extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Materialize a SparkSessionExtensions' injected functions into a
    * registry (private[sql] in Spark 4) — lets tests verify extension
    * wiring without building a second SparkContext in the same JVM.
    */
  def registerFunctions(
      exts: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    exts.registerFunctions(reg)

  /** Wrap an already-built logical plan as a DataFrame
    * (`classic.Dataset.ofRows` is `private[sql]` in Spark 4). PlanSpec's
    * window-bound gate uses this to EXECUTE the input subtree of an
    * allowlisted unpartitioned window and count its rows against the
    * entry's declared bound — turning the allowlist's prose
    * justifications into live predicates.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
