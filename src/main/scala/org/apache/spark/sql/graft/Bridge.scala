package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` internals — the supported pattern for
  * libraries that register native Catalyst expressions and custom relations
  * without going through string-parsed surfaces. Kept to three minimal
  * forwarders (Column↔Expression, and LogicalPlan→DataFrame for mounting
  * the partition-pruning [[graft.read.GraftFileIndex]] relation); everything
  * else in this project lives under the `graft` namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Tag a batch plan's rows as a streaming micro-batch — the V1
    * Source.getBatch contract (the same internalCreateDataFrame path
    * FileStreamSource takes). */
  def streamingDataFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val s = spark.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
