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

  /** [[applyChangeFeed]] plus an incrementally MAINTAINED table fingerprint
    * ([[graft.functions.Hashing.MultisetFp]] group algebra): per batch the
    * delete pre-image rows' fingerprint leaves and the upsert rows'
    * fingerprint enters, so the slave's post-batch fingerprint is known
    * WITHOUT any post-hoc table rescan — the audit a 100 TB CDC apply wants
    * per cycle. The pre-image semi-join is column-pruned and bounded by the
    * batch key set; next to the apply's own rewrite it is noise.
    *
    * `hashCols` must list the columns the fingerprint canonicalizes (same
    * contract as `multisetFingerprintAgg`). Returns the started query and a
    * thunk for the maintained fingerprint — read it after termination; it
    * equals a full recompute (asserted in StreamingSpec).
    */
  def applyChangeFeedAudited(feed: DataFrame, slave: TableStore, table: String,
                             keyCols: Seq[String], hashCols: Seq[String],
                             opCol: String = "op")
      : (StreamingQuery, () => graft.functions.Hashing.MultisetFp) = {
    import graft.functions.Hashing
    val fp = new java.util.concurrent.atomic.AtomicReference(
      Hashing.multisetFp(slave.read(table), hashCols))
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val keys = broadcast(b.select(keyCols.map(col): _*).distinct())
          val upserts = b.filter(col(opCol) === "u").drop(opCol)
          // Pre-image: exactly the rows the apply's delete-first step removes
          // (every row matching a batch key, null-safe).
          val cur = slave.read(table)
          val preimage = cur.join(keys,
            keyCols.map(k => cur(k) <=> keys(k)).reduce(_ && _), "left_semi")
          val fpOut = Hashing.multisetFp(preimage, hashCols)
          val fpIn = Hashing.multisetFp(upserts, hashCols)
          slave.applyDelta(table, keys, keyCols, upserts)
          fp.set(fp.get().remove(fpOut).merge(fpIn))
          ()
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    (q, () => fp.get())
  }
}
