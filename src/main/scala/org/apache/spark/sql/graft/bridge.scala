package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ↔ Expression conversion `private[sql]`
  * (columnNodeSupport.scala); extension libraries that define native
  * Catalyst expressions need this two-method bridge. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion through the session's
    * ColumnNode converter. `expression(c)` above returns a LAZY
    * ColumnNodeExpression wrapper, which is fine inside plans the
    * classic Dataset API builds (it rewrites the wrapper away) but
    * fatal inside a CUSTOM logical node: the analyzer leaves the
    * wrapper in place and its internal ColumnNode is not serializable
    * — the executor-side task then fails. */
  def eagerExpression(spark: org.apache.spark.sql.SparkSession,
      c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)

  /** Forwarder for the `private[sql]` float-key normalization (0.0 ==
    * -0.0, canonical NaN) — the TopKPerGroup strategy applies it to
    * group keys exactly as Spark's rule does for Aggregate/Window/Join
    * keys, which never match a custom node. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)

  /** DataFrame over a custom LogicalPlan (Dataset.ofRows went
    * `private[sql]` in Spark 4) — needed by the TopKPerGroup operator's
    * DataFrame entry point. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
