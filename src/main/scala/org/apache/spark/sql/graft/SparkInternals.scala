package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow bridge to two `private[sql]` seams the SQL-DML integration needs
  * (the standard extension-library pattern — lake formats ship the same
  * shim): building a DataFrame from an analyzer-produced LogicalPlan, and
  * wrapping a Catalyst Expression as a user-facing Column. Everything else
  * in the engine stays on the public API; keep this file the only one in
  * the `org.apache.spark.sql` namespace.
  */
object SparkInternals {

  /** A DataFrame over an already-analyzed plan (e.g. the source side of a
    * `MERGE INTO`, handed to us by the analyzer).
    */
  def dfFromPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a Catalyst expression (e.g. a DML predicate) as a Column. */
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
