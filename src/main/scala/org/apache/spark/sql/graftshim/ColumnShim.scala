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
