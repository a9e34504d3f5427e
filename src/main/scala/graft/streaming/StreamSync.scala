package graft.streaming

import graft.sync.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's iterative re-sync loop ("run it frequently so each run is
  * small", README.md:24) as a Structured Streaming pipeline: a change feed of
  * master rows is applied to the slave store incrementally, one micro-batch
  * at a time, via `foreachBatch` (SURVEY §2.7's Spark mapping).
  *
  * Feed contract: the master's row columns plus an `op` column — `"u"` for
  * upsert (row reflects master's current content) and `"d"` for delete (only
  * the key columns are consulted). Per batch the apply order is the C7
  * invariant (`Synchronizer.php:495-501`): delete every batch key first —
  * which clears both tombstones and stale versions of updated rows — then
  * append the upsert rows.
  *
  * The feed must be KEY-COMPLETE PER BATCH: every row sharing a key tuple
  * arrives in the same micro-batch (stage the feed hash-partitioned by key).
  * If a key's rows straddle batches, the later batch's delete-first step
  * wipes sibling rows the earlier batch appended and the slave diverges —
  * the same atomic-per-key requirement real CDC apply pipelines have. A key
  * may recur across batches (later batch wins); that is safe.
  *
  * Scale: each micro-batch touches only batch-sized state; the slave-side
  * delete is the store's keyed-delete sink (anti-join rewrite on parquet,
  * batched DELETE on JDBC). Nothing is collected to the driver.
  */
object StreamSync {

  /** Start applying `feed` (a streaming DataFrame) to `slave`.`table`.
    * Caller awaits termination; with `Trigger.AvailableNow` the call drains
    * the staged feed and stops — one reconciliation cycle, exactly the
    * reference's cron-style run.
    */
  def applyChangeFeed(feed: DataFrame, slave: TableStore, table: String,
                      keyCols: Seq[String], opCol: String = "op"): StreamingQuery =
    feed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          // Micro-batches are bounded by construction → broadcast the key
          // set so the store's delete anti-join never shuffles the table.
          val keys = broadcast(b.select(keyCols.map(col): _*).distinct())
          val upserts = b.filter(col(opCol) === "u").drop(opCol)
          // One store-level delta apply per batch (COW stores fuse the
          // delete + insert into a single rewrite).
          slave.applyDelta(table, keys, keyCols, upserts)
          ()
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
