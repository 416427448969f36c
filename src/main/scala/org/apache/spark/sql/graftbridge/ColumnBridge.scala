package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 decouples the public Column API
  * from Catalyst expressions and gates the converters `private[sql]`;
  * custom native expressions still need both directions, so this lives
  * inside the sql package tree (the conventional extension-point
  * pattern). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan — Dataset.ofRows is
    * likewise `private[sql]`. The plan goes through the full analyzer,
    * so unresolved attributes in custom nodes resolve normally. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Re-issue a batch DataFrame as a STREAMING one (isStreaming=true)
    * — the V1 `Source.getBatch` contract: the engine asserts the
    * returned plan is streaming, and `internalCreateDataFrame` (the
    * blessed way FileStreamSource/KafkaSource mark theirs) is
    * `private[sql]`. The physical plan is materialized lazily via
    * `queryExecution.toRdd`. */
  def asStreamingDataFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[
      org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
