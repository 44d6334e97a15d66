package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression plumbing — the standard
  * technique for Spark extension libraries that define custom Catalyst
  * expressions (the public API intentionally hides Expression since 4.0).
  * Nothing else in the engine reaches into Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder as a temp function on a live session
    * (`sessionState` is private[sql]; extension-install is preferred, this
    * covers externally-created sessions).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Build a DataFrame over a custom (already-resolved) logical plan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Eagerly release the storage blocks behind a `localCheckpoint`ed
    * DataFrame (the analyzed plan is a LogicalRDD over the persisted
    * RDD). Iterative algorithms that checkpoint per round must free the
    * PREVIOUS round once the next one materializes — waiting for the
    * ContextCleaner to notice the dropped reference let blocks from
    * every round accumulate (round-11 verdict: sf30/sf100 LPA exhausted
    * the 63 GB scratch volume on dead checkpoint blocks). `blocking =
    * false`: release is a fire-and-forget RPC; the caller never waits.
    * No-op for frames that are not checkpoint-backed.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
