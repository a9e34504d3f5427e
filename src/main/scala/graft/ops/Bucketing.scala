package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located (bucketed) joins — the pre-shuffle trade: pay one clustered
  * write per table, then every equi-join/aggregation on the bucket key runs
  * shuffle-free forever after. The right call for the 100 TB fact tables the
  * diff and analytics corpus repeatedly join on the same keys
  * (lineitem⋈orders on orderkey, hash maps on key).
  */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (external, at `path`),
    * clustered AND sorted by `keys` into `numBuckets` — sorted buckets let
    * sort-merge joins skip both the exchange and the sort.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
