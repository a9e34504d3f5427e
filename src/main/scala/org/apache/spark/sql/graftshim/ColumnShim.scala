package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Expression ↔ Column converters (they are
  * accessible from subpackages of `org.apache.spark.sql`). This is the
  * supported seam for exposing custom Catalyst expressions as Columns in
  * Spark 4's classic API — equivalent to what `functions._` does internally.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an analyzed logical plan — the `Dataset.ofRows` seam
    * a custom command needs to execute its (already-resolved) child query.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame over an InternalRow RDD with `isStreaming = true` — what a
    * V1 streaming Source's `getBatch` must return (MicroBatchExecution
    * asserts the flag; the public createDataFrame can't set it).
    */
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
                         rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                         schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** A BATCH DataFrame over an InternalRow RDD — what a V1 streaming Sink's
    * `addBatch` needs to hand the incoming micro-batch to a batch write
    * path (the frame Spark passes in carries `isStreaming = true`, which
    * every batch writer asserts against).
    */
  def batchDataFrame(spark: org.apache.spark.sql.SparkSession,
                     rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                     schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Register a SQL function on a LIVE session's registry (the
    * `SparkSessionExtensions` path only applies at session build time;
    * `getOrCreate` against an active session silently skips extensions).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
