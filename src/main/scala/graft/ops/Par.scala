package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Partitioning guard for compute-heavy operators. */
object Par {

  /** Ensure at least default-parallelism partitions before a
    * compute-intensive per-row or join stage. Small parquet corpora arrive
    * as one or two input splits (bytes-based splitting), which would
    * serialize an operator whose WORK is quadratic-ish in rows — the
    * 5000-doc jaccard join ran in a single task (18.7 s) until fanned out.
    * No-op when the input is already wide enough, so at real corpus scale
    * the scan partitioning wins and no shuffle is added.
    *
    * Width comes from a file-index size estimate on pure file-scan plans
    * (no planning triggered); `df.rdd.getNumPartitions` — which forces a
    * physical-plan conversion per call, on every hot dedup/ANN path — is
    * only the fallback for plans with non-file leaves.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val wide = scanWidthEstimate(df) match {
      case Some(w) => w >= target
      case None => df.rdd.getNumPartitions >= target
    }
    if (wide) df else df.repartition(target)
  }

  /** Split-count estimate straight from the file indexes of a pure
    * file-scan plan: ceil(bytes / maxPartitionBytes) per relation, which
    * under-counts Spark's packing (openCostInBytes, file boundaries) —
    * erring toward fanning out, never toward serializing. None when any
    * leaf is not a file relation (checkpointed RDDs report their real
    * width; other leaves defer to the physical plan).
    */
  private def scanWidthEstimate(df: DataFrame): Option[Long] = {
    val maxSplit =
      math.max(1L, df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val widths = df.queryExecution.analyzed.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          Some(math.max(1L, (fs.location.sizeInBytes + maxSplit - 1) / maxSplit))
        case _ => None
      }
      case lr: LogicalRDD => Some(lr.rdd.getNumPartitions.toLong)
      case _ => None
    }
    if (widths.isEmpty || widths.contains(None)) None else Some(widths.flatten.sum)
  }
}
