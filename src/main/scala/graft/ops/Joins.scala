package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks but a large-scale event
  * pipeline needs: as-of (nearest preceding match) and interval/range joins.
  *
  * Both are built from Spark primitives in shapes that survive 100 TB:
  *  - as-of: the classic union + keyed window trick — ONE shuffle on the key
  *    columns, a per-key sort, zero range explosion (a naive `l.ts >= r.ts`
  *    theta-join is O(n·m) pairs before its filter; this is O(n+m log)).
  *  - range: bucketize the time axis and explode each interval onto the
  *    buckets it covers, turning the inequality join into an equi-join on
  *    bucket id + a residual filter. Shuffle key cardinality = #buckets,
  *    work ∝ matches, never the cross product.
  */
object Joins {

  /** Backward as-of join: for each `left` row, the single `right` row with
    * the greatest `rightTs` ≤ `leftTs` within the same `keys` group (the
    * "most recent prior observation" join of market-data/event pipelines).
    *
    * Returns all `left` columns plus `outCol` = that row's `valueCol`
    * (null when no prior right row exists — left-outer semantics).
    *
    * Tie rule: right rows sort before left rows at equal timestamps, so a
    * right row AT `leftTs` matches (inclusive ≤); equal-timestamp right rows
    * tie-break by greatest `valueCol`, keeping the result deterministic.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(valueCol).as(outCol)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(right.schema(valueCol).dataType).as(outCol)) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col(outCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn(outCol, last(col(outCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col(outCol): _*)
  }

  /** Range join of `left` points against `ranges` intervals
    * `[startCol, endCol)` with NO equi-key: each interval is exploded onto
    * the `bucketWidth`-sized buckets it covers, the join runs on bucket id,
    * and the residual inequality filters within the bucket. All three
    * columns are epoch-micros longs (cast timestamps via `unix_micros`).
    *
    * Choose `bucketWidth` ≈ the typical interval length: wider wastes
    * residual filtering, narrower multiplies the explode factor.
    */
  def bucketedRangeJoin(left: DataFrame, pointCol: String,
                        ranges: DataFrame, startCol: String, endCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    // Empty intervals are dropped up front: `sequence(a, b)` with b < a
    // would silently generate a DESCENDING bucket list.
    val r = ranges.filter(col(endCol) > col(startCol)).withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    l.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
