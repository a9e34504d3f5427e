package graft.ops

import org.apache.spark.sql.DataFrame

/** Partitioning guard for compute-heavy operators. */
object Par {

  /** Ensure at least default-parallelism partitions before a
    * compute-intensive per-row or join stage. Small parquet corpora arrive
    * as one or two input splits (bytes-based splitting), which would
    * serialize an operator whose WORK is quadratic-ish in rows — the
    * 5000-doc jaccard join ran in a single task (18.7 s) until fanned out.
    * No-op when the input is already wide enough, so at real corpus scale
    * the scan partitioning wins and no shuffle is added.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
