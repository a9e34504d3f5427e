package graft

import graft.functions.Hashing
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The NATIVE streaming source over the table format:
  * `spark.readStream.format("graft")` rides snapshot history with its own
  * checkpointed snapshot cursor — load-then-stream, exactly-once row
  * delivery across appends AND a mid-stream compaction (which rewrites
  * every file), nothing re-delivered on an idle restart.
  */
class GraftStreamSourceSpec extends SparkSpec {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Hashing.multisetFingerprintAgg(df.select(docCols.map(col): _*), docCols)
      .head().getString(0)

  test("readStream(graft): snapshot-cursor stream is exactly-once across appends and compaction") {
    val dir = tmpDir("gstream") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.filter(col("doc_id") % 3 =!= 0).repartition(4).write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val ckpt = tmpDir("gstream_ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    var runs = 0
    def runOnce(): Unit = {
      runs += 1
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(got.add(_): Unit)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // Run 1: the full latest snapshot (load-then-stream).
    runOnce()
    val nSubset = docs.filter(col("doc_id") % 3 =!= 0).count()
    assert(got.size.toLong == nSubset, s"initial load: got ${got.size}, want $nSubset")
    // Append the rest (incremental snapshot), then COMPACT — every file is
    // rewritten; a file-diff source would re-deliver the whole table here.
    docs.filter(col("doc_id") % 3 === 0).repartition(2)
      .write.mode("append").parquet(dir)
    Manifest.createIncremental(spark, dir, "doc_id")
    Layout.compactTable(spark, dir, targetBytes = 64L << 20)
    // Run 2 (fresh query, same checkpoint): ONLY the appended rows arrive.
    runOnce()
    assert(got.size.toLong == docs.count(),
      s"after append+compaction: got ${got.size}, want ${docs.count()} — " +
        "re-delivery across a content-invariant rewrite breaks exactly-once")
    // Run 3: nothing new — idle restart delivers zero rows.
    runOnce()
    assert(got.size.toLong == docs.count(), "idle restart must deliver nothing")
    // Value-exact: the accumulated stream IS the table, each row once.
    import scala.jdk.CollectionConverters._
    val accumulated = spark.createDataFrame(
      new java.util.ArrayList(got), spark.read.parquet(dir).schema)
    assert(fp(accumulated) == fp(docs), "accumulated stream must equal the table")
  }

  test("readStream(graft): an unmanifested table fails typed at stream start") {
    val dir = tmpDir("gstream_bad") + "/documents"
    spark.read.parquet(s"$sf001/documents.parquet").limit(10).write.parquet(dir)
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft").load(dir)
    }
  }

  test("readStream(graft): startingSnapshotId skips the initial load; maxSnapshotsPerTrigger bounds batches") {
    val dir = tmpDir("gstream_opts") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0).repartition(2).write.parquet(dir)
    val id1 = Manifest.create(spark, dir, "doc_id")
    // Three more snapshots (2, 3, 4) — the backfill the options shape.
    (1 to 3).foreach { k =>
      docs.filter(col("doc_id") % 4 === k).repartition(1)
        .write.mode("append").parquet(dir)
      Manifest.createIncremental(spark, dir, "doc_id")
    }
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val ckpt = tmpDir("gstream_opts_ckpt")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingSnapshotId", id1)
        .option("maxSnapshotsPerTrigger", 1)
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
          if (rows.nonEmpty) {
            batches.incrementAndGet(); sizes += rows.length
            rows.foreach(got.add(_): Unit)
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // Rate-limited catch-up: each AvailableNow run advances at most ONE
    // snapshot (the V1 wrapper pins its target offset at start), so the
    // 3-snapshot backlog takes exactly 3 runs.
    runOnce(); runOnce(); runOnce()
    // startingSnapshotId = id1: the initial snapshot's rows are SKIPPED —
    // only post-id1 appends arrive.
    val want = docs.filter(col("doc_id") % 4 =!= 0)
    assert(got.size.toLong == want.count(),
      s"got ${got.size}, want ${want.count()} (no initial-load rows)")
    import scala.jdk.CollectionConverters._
    val accumulated = spark.createDataFrame(
      new java.util.ArrayList(got), spark.read.parquet(dir).schema)
    assert(fp(accumulated) == fp(want))
    // maxSnapshotsPerTrigger = 1: the three snapshots arrive in THREE
    // bounded micro-batches, not one catch-all.
    assert(batches.get() == 3,
      s"expected 3 rate-limited batches, got ${batches.get()}")
  }

  test("readStream(graft): withChanges streams the tagged row-level feed incl. COW deletes") {
    val dir = tmpDir("gstream_cdf") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.filter(col("doc_id") < 200).repartitionByRange(4, col("doc_id"))
      .write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val ckpt = tmpDir("gstream_cdf_ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("withChanges", "true")
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(got.add(_): Unit)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce() // initial load: every row tagged insert
    assert(got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "insert") == 200L)
    // A COW delete: the feed must now deliver the doomed rows as deletes.
    Layout.deleteRange(spark, dir, "doc_id", 50L, 99L)
    runOnce()
    val dels = got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "delete")
    assert(dels == 50L, s"expected 50 delete rows in the feed, got $dels")
  }

  test("readStream(graft): withChanges delivers DELETION-VECTOR deletes (DV-only commits change no files)") {
    val dir = tmpDir("gstream_dv") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.filter(col("doc_id") < 200).repartitionByRange(4, col("doc_id"))
      .write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val ckpt = tmpDir("gstream_dv_ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("withChanges", "true")
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(got.add(_): Unit)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "insert") == 200L)
    // A merge-on-read delete commits NO file changes — only the sidecar
    // grows. The feed must still deliver exactly the deleted rows.
    Layout.deleteRangeDV(spark, dir, "doc_id", 50L, 99L)
    runOnce()
    val dels = got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "delete")
    assert(dels == 50L, s"expected 50 DV-delete rows in the feed, got $dels")
    // A second DV delete streams only ITS delta (no replays of the first).
    Layout.deleteRangeDV(spark, dir, "doc_id", 0L, 9L)
    runOnce()
    assert(got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "delete") == 60L)
    assert(got.asScalaCount(_ => true) == 260L, "no replayed rows")
  }

  test("readStream(graft): withChanges across a MERGE-ON-READ upsert commit (DV delta + appends, one snapshot)") {
    val dir = tmpDir("gstream_mdv") + "/documents"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    docs.filter(col("doc_id") < 200).repartitionByRange(4, col("doc_id"))
      .write.parquet(dir)
    Manifest.create(spark, dir, "doc_id")
    val ckpt = tmpDir("gstream_mdv_ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("withChanges", "true")
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(got.add(_): Unit)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce() // initial load: 200 inserts
    // ONE commit carrying BOTH a DV delta (old versions of 20 updated
    // rows) and appended files (20 updates + 10 inserts): the feed must
    // deliver 20 deletes and 30 inserts for that single snapshot step.
    val delta = docs.filter(col("doc_id").between(40L, 59L))
      .withColumn("source", lit("mdv"))
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 5000L)
        .withColumn("source", lit("mdv")))
    val r = Layout.mergeKeyedDvOnce(spark, dir, "doc_id", "gsmdv", 0L, delta)
    assert(r.filesRewritten == 0 && r.rowsUpdated == 20L, s"$r")
    runOnce()
    assert(got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "delete") == 20L)
    assert(got.asScalaCount(r => r.getString(r.fieldIndex("change")) == "insert") == 230L)
    // The updated rows' NEW versions are in the insert side, tagged once.
    import scala.jdk.CollectionConverters._
    val mdvIns = got.asScala.count(row =>
      row.getString(row.fieldIndex("change")) == "insert" &&
        row.getString(row.fieldIndex("source")) == "mdv")
    assert(mdvIns == 30, s"expected the 30 upserted rows once, got $mdvIns")
    // Idle restart replays nothing.
    runOnce()
    assert(got.asScalaCount(_ => true) == 250L)
  }

  private implicit class QueueOps(
      q: java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]) {
    def asScalaCount(p: org.apache.spark.sql.Row => Boolean): Long = {
      import scala.jdk.CollectionConverters._
      q.asScala.count(p).toLong
    }
  }
}
