package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Owned release of materialized frames.
  *
  * `Dataset.unpersist` only covers CacheManager entries (`.persist`);
  * a `localCheckpoint` lives as storage blocks on the checkpointed RDD
  * behind a [[LogicalRDD]] leaf, which the CacheManager never sees — so
  * checkpoint blocks otherwise sit in the block manager until
  * nondeterministic ContextCleaner GC, pinning executor memory for the
  * life of the session (measured as a ~2× whole-bench slowdown once a few
  * corpus-sized checkpoints accumulated).
  */
object Caching {

  /** Release every storage block the frame pins: its CacheManager entry
    * (if persisted) and the RDD blocks of every checkpointed leaf in its
    * plan. Non-persisted RDD leaves make `unpersist` a no-op, so this is
    * safe to call on any frame once its contents are no longer needed.
    * A localCheckpointed frame is NOT recomputable after release (lineage
    * was cut) — callers release only after the final consumption.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.logical.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
