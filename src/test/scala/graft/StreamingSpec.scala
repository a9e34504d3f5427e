package graft

import graft.streaming.{Sessionize, StreamSync}
import graft.sync.ParquetStore
import org.apache.spark.sql.functions._

/** Structured Streaming surface: stateful sessionization and the
  * foreachBatch change-feed re-sync loop (SURVEY §2.7).
  */
class StreamingSpec extends SparkSpec {

  private def writeEvents(dir: String): Unit = {
    import spark.implicits._
    // user 1: two sessions split by a 2000 s gap; user 2: one session.
    val base = 1700000000L
    Seq(
      (1L, 1L, base), (1L, 2L, base + 60), (1L, 3L, base + 120),
      (1L, 4L, base + 120 + 2000), (1L, 5L, base + 120 + 2060),
      (2L, 6L, base + 10)
    ).toDF("user_id", "event_id", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
      .write.parquet(s"$dir/events")
  }

  test("Sessionize: 30-min gap splits sessions, counts and bounds correct") {
    val dir = tmpDir("sess")
    writeEvents(dir)
    val schema = spark.read.parquet(s"$dir/events").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events")
    val out = Sessionize.runAvailableNow(stream, gapSeconds = 1800, queryName = "t_sessions")
      .orderBy("user_id", "session_id")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L, 3L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("Sessionize: session spanning micro-batches stays ONE session") {
    import spark.implicits._
    val dir = tmpDir("sess_mb")
    val base = 1700000000L
    // file A ends with user 1's session OPEN; file B continues it within the
    // gap, then a later burst opens session 2. user 3 exists only in file B.
    Seq((1L, 1L, base), (1L, 2L, base + 60))
      .toDF("user_id", "event_id", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
      .coalesce(1).write.parquet(s"$dir/events")
    val schema = spark.read.parquet(s"$dir/events").schema
    Seq((1L, 3L, base + 120), (1L, 4L, base + 120 + 2000), (3L, 5L, base))
      .toDF("user_id", "event_id", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
      .coalesce(1).write.mode("append").parquet(s"$dir/events")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/events")
    val out = Sessionize.runAvailableNow(stream, gapSeconds = 1800, queryName = "t_sessions_mb")
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1: events 1-3 are ONE session across the batch boundary (3 events),
    // then session 2 (1 event); user 3: one session.
    assert(out === Seq((1L, 1L, 3L), (1L, 2L, 1L), (3L, 1L, 1L)))
  }

  test("bounded sessionizer emits correct sessions and DROPS state after timeout") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // user 1: two events 10 min apart (one session), then one 2 h later (a
    // second session). user 2: one event. gap = 30 min.
    val ev = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(130)),
      (2L, 4L, ts(5))
    ).toDF("user_id", "event_id", "ts")
    val sentinel = Seq((-1L, 0L, ts(130 + 240))).toDF("user_id", "event_id", "ts")
    val stage = java.nio.file.Files.createTempDirectory("graft_sess_bounded_spec")
    def put(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sess_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, stage.resolve(name))
      java.nio.file.Files.setLastModifiedTime(stage.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime)); ()
    }
    val now = System.currentTimeMillis()
    put(ev, "events.parquet", now - 120000)
    put(sentinel, "sentinel1.parquet", now - 60000)
    put(sentinel, "sentinel2.parquet", now)
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val run = Sessionize.runAvailableNowBounded(
      src.withWatermark("ts", "10 minutes"), gapSeconds = 1800,
      queryName = "graft_sess_bounded_spec")
    val got = run.sessions.filter(col("user_id") >= 0)
      .select("user_id", "session_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
    // The bounded-state claim: after the sentinel advanced the watermark
    // past every real close instant, the timeouts fired and DELETED those
    // state rows — only the sentinel user's own open session remains.
    assert(run.finalStateRows == 1L, s"state rows left: ${run.finalStateRows}")
  }

  test("bounded sessionizer merges out-of-order-but-in-budget events without regressing t_end") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // Batch 1: user 1 at t=0 and t=20 (session open, end=20). Batch 2
    // arrives OUT OF ORDER relative to batch 1: t=10 (inside the open
    // session) and t=-5 (older than the recorded start, within gap) — both
    // admitted by the 60-minute lateness budget. A copy-the-event merge
    // would regress end to 10 and leave start at 0; the max/min merge must
    // report the true hull [-5, 20] with all 4 events in ONE session.
    val b1 = Seq((1L, 1L, ts(0)), (1L, 2L, ts(20))).toDF("user_id", "event_id", "ts")
    val b2 = Seq((1L, 3L, ts(10)), (1L, 4L, ts(-5))).toDF("user_id", "event_id", "ts")
    val sentinel = Seq((-1L, 0L, ts(20 + 240))).toDF("user_id", "event_id", "ts")
    val stage = java.nio.file.Files.createTempDirectory("graft_sess_ooo_spec")
    def put(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sess_ooo_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, stage.resolve(name))
      java.nio.file.Files.setLastModifiedTime(stage.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime)); ()
    }
    val now = System.currentTimeMillis()
    put(b1, "b1.parquet", now - 180000)
    put(b2, "b2.parquet", now - 120000)
    put(sentinel, "sentinel1.parquet", now - 60000)
    put(sentinel, "sentinel2.parquet", now)
    val src = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val run = Sessionize.runAvailableNowBounded(
      src.withWatermark("ts", "60 minutes"), gapSeconds = 1800,
      queryName = "graft_sess_ooo_spec")
    val got = run.sessions.filter(col("user_id") >= 0)
      .select("user_id", "session_id", "n_events", "t_start", "t_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSeq
    assert(got == Seq((1L, 1L, 4L, ts(-5), ts(20))), s"got $got")
  }

  test("streaming ingest self-compacts mid-stream via compactIfNeeded, results unchanged") {
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val docs = graft.queries.Registry.table(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val feedDir = tmpDir("ingest_compact_feed")
    docs.repartition(3, pmod(col("doc_id"), lit(3)))
      .write.mode("overwrite").parquet(feedDir)
    val state = tmpDir("ingest_compact_state")
    val outDir = tmpDir("ingest_compact_out")
    // foreachBatch runs on the driver, so a plain counter observes the
    // policy decisions; `fired` records the batch ids where compaction ran.
    val fired = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    var batches = 0L
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val idx = new graft.ops.DurableMinHashIndex(batch.sparkSession, state,
          shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4)
        val pairs = idx.ingest(batch, "doc_id", "text").select("id_a", "id_b")
        pairs.write.mode("append").parquet(outDir)
        graft.ops.Caching.release(pairs)
        if (idx.compactIfNeeded(maxStoreFiles = 2)) fired.add(batchId): Unit
        batches += 1
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches == 3L)
    // A compaction genuinely ran MID-stream: some fired batch precedes the
    // last one (ingests after it probed the compacted store).
    assert(fired.asScala.exists(_ < batches - 1),
      s"no mid-stream compaction fired: $fired")
    // The self-maintained stream still finds exactly the incremental truth.
    val found = spark.read.schema("id_a BIGINT, id_b BIGINT").parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 3).flatMap { i =>
      graft.ops.Dedup.incrementalNearDups(
          docs.filter(pmod(col("doc_id"), lit(3)) < i),
          docs.filter(pmod(col("doc_id"), lit(3)) === i),
          "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    }.toSet
    assert(found == expected)
    assert(found.nonEmpty)
  }

  test("StreamSync change feed: upserts + deletes converge slave to master") {
    import spark.implicits._
    // ids 5 and 15 are duplicate keys (two rows each) — the feed must carry
    // a key's rows in one batch (key-hash partitioning below) to converge.
    val masterDf = ((1 to 100).map(i => (i.toLong, s"name_$i", i * 10.0))
      ++ Seq((5L, "name_5b", 51.0), (15L, "name_15b", 151.0)))
      .toDF("id", "name", "v")

    val slaveDir = tmpDir("resync_slave")
    // Slave: missing ids 1-10, stale v for ids 11-20, excess ids 101-103.
    masterDf.filter(col("id") > 10)
      .withColumn("v", when(col("id") <= 20, col("v") + 999).otherwise(col("v")))
      .unionByName(Seq((101L, "x", 0.0), (102L, "x", 0.0), (103L, "x", 0.0)).toDF("id", "name", "v"))
      .write.parquet(s"$slaveDir/t.parquet")

    val feedDir = tmpDir("resync_feed")
    masterDf.filter(col("id") <= 20).withColumn("op", lit("u"))
      .unionByName(Seq((101L, "x", 0.0, "d"), (102L, "x", 0.0, "d"), (103L, "x", 0.0, "d"))
        .toDF("id", "name", "v", "op"))
      .repartition(3, col("id"))
      .write.mode("overwrite").parquet(feedDir)

    val schema = spark.read.parquet(feedDir).schema
    val feed = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feedDir)
    val slave = new ParquetStore(spark, slaveDir)
    StreamSync.applyChangeFeed(feed, slave, "t", Seq("id")).awaitTermination()

    val synced = slave.read("t")
    assert(synced.count() === 102)
    assert(synced.except(masterDf).isEmpty && masterDf.except(synced).isEmpty)
  }
}
