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
}
