package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming corpus: the reference's raison d'être is iterative
  * re-sync (README.md:24); its Spark-native form is a micro-batch streaming
  * pipeline. These queries run a real `readStream → writeStream` cycle
  * synchronously (Trigger.AvailableNow + memory sink), so the streaming
  * plumbing — source schema inference, watermark, windowed state — is
  * exercised in the verify gate, with batch-SQL oracles.
  */
object StreamingQueries {
  import Registry.{table => T, duckRowHash}

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily lowered for a
    * STATEFUL streaming query. The state store pays per-partition-per-batch
    * file I/O (delta + snapshot + maintenance), so state partition count is
    * a disk-I/O multiplier, not a parallelism win — the partition count is
    * baked into the checkpoint at first start, making this the one knob that
    * must be set before `start()`. Batch queries are untouched (conf is
    * restored immediately after the stream drains).
    */
  private def withStatePartitions[T](s: org.apache.spark.sql.SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }

  /** Stage `df` as ONE parquet part file named `name` under `stage` with a
    * pinned mtime. The file stream source processes files oldest-mtime
    * first, so the mtimes define micro-batch ORDER — the mechanism both
    * sentinel-closed queries (hourly append windows, left-outer interval
    * join) use to guarantee the watermark-advancing files arrive last.
    */
  private def stageParquetFile(stage: java.nio.file.Path,
      df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val tmp = Files.createTempDirectory("graft_stage_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = stage.resolve(name)
    Files.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(mtime)); ()
  }

  def all: Seq[Q] = Seq(

    // The reference's whole raison d'être on Structured Streaming: a CDC-style
    // change feed (upserts + deletes) drained micro-batch by micro-batch into
    // the slave store via foreachBatch (graft.streaming.StreamSync). Feed is
    // staged as 4 parquet files read with maxFilesPerTrigger=1 → 4 real
    // micro-batches, hash-partitioned BY KEY: the synthetic lineitem has
    // duplicate (l_orderkey, l_linenumber) tuples, and a feed that splits a
    // key's rows across batches cannot converge (a later batch's delete wipes
    // siblings an earlier batch appended) — the key-complete-per-batch
    // contract documented on StreamSync.applyChangeFeed.
    // Oracle: converged slave ≡ master fingerprint.
    Q("stream_resync",
      (s, dir) => {
        import graft.functions.Hashing
        val li = T(s, dir, "lineitem")
        // Slave diverges three ways: missing rows (%7 orders), stale updates
        // (%13 orders), and 3 fabricated excess rows — the shared staged
        // fixture (SyncQueries.makeSlaveDir; its excess pick is the same
        // deterministic lowest-sort-order 3 used for the delete records
        // below).
        val slaveDir = SyncQueries.makeSlaveDir(s, dir, "resync")
        val excess = li.orderBy(liCols.map(col): _*).limit(3)
          .withColumn("l_orderkey", col("l_orderkey") + 1000000L)
        // Change feed: master-content upserts for the divergent keys, delete
        // records for the excess keys.
        val feedDir = java.nio.file.Files.createTempDirectory("graft_feed").toString
        li.filter(col("l_orderkey") % 7 === 0 || col("l_orderkey") % 13 === 0)
          .withColumn("op", lit("u"))
          .unionByName(excess.withColumn("op", lit("d")))
          .repartition(4, col("l_orderkey"))
          .write.mode("overwrite").parquet(feedDir)
        val feedSchema = s.read.parquet(feedDir).schema
        val feed = s.readStream.schema(feedSchema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir)
        val slave = new graft.sync.ParquetStore(s, slaveDir)
        StreamSyncHolder.run(feed, slave)
        val synced = slave.read("lineitem")
        Hashing.multisetFingerprintAgg(synced, liCols)
      },
      Some(Registry.duckMultisetFingerprint(liCols, "lineitem"))),

    // Same CDC drain shape, but the result row is the MAINTAINED fingerprint
    // (MultisetFp updated per batch from delete pre-images + upserts), never
    // a post-hoc rescan of the synced table — the oracle (master's
    // fingerprint) passing proves both convergence AND that the incremental
    // audit tracked every batch exactly. Runs on orders (plain stream_resync
    // keeps the heavyweight lineitem drain): the audit mechanics are
    // table-size-independent, so the demo shouldn't double-pay the big COW
    // rewrites.
    Q("stream_resync_audited",
      (s, dir) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        val orders = T(s, dir, "orders").select(cols.map(col): _*)
        val ghosts = orders.orderBy("o_orderkey").limit(2)
          .withColumn("o_orderkey", col("o_orderkey") + 900000L)
        // Slave diverges three ways: missing (%5), stale (%7), excess ghosts.
        val slaveDir = java.nio.file.Files.createTempDirectory("graft_aud_slave").toString
        orders.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice", when(col("o_orderkey") % 7 === 0,
            col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
          .unionByName(ghosts)
          .write.mode("overwrite").parquet(s"$slaveDir/orders.parquet")
        val feedDir = java.nio.file.Files.createTempDirectory("graft_feed_aud").toString
        // 2 files → 2 micro-batches (key-complete: partitioned by the key).
        orders.filter(col("o_orderkey") % 5 === 0 || col("o_orderkey") % 7 === 0)
          .withColumn("op", lit("u"))
          .unionByName(ghosts.withColumn("op", lit("d")))
          .repartition(2, col("o_orderkey"))
          .write.mode("overwrite").parquet(feedDir)
        val feedSchema = s.read.parquet(feedDir).schema
        val feed = s.readStream.schema(feedSchema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir)
        val slave = new graft.sync.ParquetStore(s, slaveDir)
        val (q, maintained) = graft.streaming.StreamSync.applyChangeFeedAudited(
          feed, slave, "orders", Seq("o_orderkey"), cols)
        q.awaitTermination()
        val fp = maintained()
        import s.implicits._
        Seq((fp.render, fp.count)).toDF("fingerprint", "n_rows")
      },
      Some(Registry.duckMultisetFingerprint(
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"), "orders"))),

    // Tumbling-window (1 h) counts per event type, computed by a streaming
    // query over the events parquet. Oracle = the equivalent batch aggregate.
    // Output mode is `complete` because AvailableNow drains the finite feed
    // and stops BEFORE the watermark would close the final window — append
    // mode would never emit it, so the oracle could not be the full batch
    // aggregate. A production continuous run of this exact plan flips to
    // append + the existing watermark for bounded state (windows emit once
    // closed); state here is |windows × types|, never event-sized.
    Q("stream_hourly_counts",
      (s, dir) => withStatePartitions(s, 8) {
        val src = Registry.eventsStream(s, dir)
        val agg = src
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
          .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
        val qname = "graft_stream_hourly"
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname)
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // The PRODUCTION shape of the hourly windows: append mode + watermark,
    // so state is bounded (closed windows are evicted) and each window is
    // emitted exactly once — what a continuous deployment of
    // stream_hourly_counts runs. The finite-feed caveat (AvailableNow stops
    // before the watermark passes the last window) is solved in-band: the
    // feed carries terminal watermark-advancing sentinel events, staged as
    // the LAST files (mtimes pin the file-source order), whose timestamp
    // clears every real window end + delay. The sentinels are deliberately
    // NOT filtered before the aggregate — Catalyst pushes any such
    // deterministic predicate below the EventTimeWatermark node into the
    // scan, and a filtered sentinel never advances event time (measured:
    // watermark stuck, last windows unemitted). Instead they flow into the
    // aggregate, where their own window structurally cannot close (the
    // watermark trails max event time by the delay, so it never passes the
    // sentinel's window end) and thus never reaches the append sink; the
    // batch read of the sink filters defensively anyway. Oracle = the full
    // batch aggregate, same as the complete-mode variant, which is exactly
    // the "every window emitted once, none dropped" claim.
    Q("stream_hourly_counts_append",
      (s, dir) => withStatePartitions(s, 8) {
        val ev = Registry.events(s, dir).select("ts", "event_type", "value")
        val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        val sentinel = ev.sparkSession.range(1).select(
          lit(new java.sql.Timestamp(maxTs.getTime + 4L * 3600 * 1000)).as("ts"),
          lit("__advance__").as("event_type"),
          lit(0.0).as("value"))
        val stage = java.nio.file.Files.createTempDirectory("graft_hourly_append")
        val now = System.currentTimeMillis()
        stageParquetFile(stage, ev, "events.parquet", now - 120000)
        // TWO sentinel batches: the first advances the watermark past every
        // real window; the second is a data batch processed UNDER that
        // advanced watermark, which closes and emits the final windows —
        // AvailableNow does not reliably run a trailing no-data micro-batch
        // after the last file, so the close must ride a data batch.
        stageParquetFile(stage, sentinel, "sentinel1.parquet", now - 60000)
        stageParquetFile(stage, sentinel, "sentinel2.parquet", now)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        val agg = src
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
          .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
        val qname = "graft_stream_hourly_append"
        val q = agg.writeStream.outputMode("append")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname).filter(col("event_type") =!= "__advance__")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // Stateful sessionization-lite: per-user event counts and value totals
    // via a streaming aggregation (state store exercised), batch oracle.
    Q("stream_user_totals",
      (s, dir) => withStatePartitions(s, 8) {
        val src = Registry.eventsStream(s, dir)
        val agg = src.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        val qname = "graft_stream_user"
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname)
      },
      Some("""SELECT user_id, count(*) AS n_events,
              | cast(sum(cast(value as decimal(12,2))) as double) AS total_value
              |FROM events GROUP BY user_id""".stripMargin)),

    // Stream–static enrichment: the streaming feed joined per micro-batch to
    // a BATCH dimension (customer→nation pre-joined statically, then
    // broadcast) — the standard bronze→silver enrichment shape. The
    // stream-static join is stateless (the dim is re-resolved per batch, no
    // join state store), so at scale the only state is the downstream agg's;
    // the explicit broadcast keeps the per-batch join map-side — without it
    // each micro-batch would shuffle its rows by key against the dim.
    Q("stream_enrich_static",
      (s, dir) => withStatePartitions(s, 8) {
        val src = Registry.eventsStream(s, dir).select("user_id", "event_type", "value")
        val dim = Registry.table(s, dir, "customer")
          .join(Registry.table(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey").as("user_id"), col("n_name"))
        val agg = src.join(broadcast(dim), Seq("user_id"))
          .groupBy(col("n_name"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
        val qname = "graft_stream_enrich"
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname)
      },
      Some("""SELECT n_name, event_type, count(*) AS n_events,
              | cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
              |FROM events JOIN customer ON user_id = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY 1, 2""".stripMargin)),

    // Streaming exact dedup with bounded state: the feed carries every event
    // TWICE (two staged copies of the table); dropDuplicatesWithinWatermark
    // on event_id keys the state store and the 1-hour watermark bounds it —
    // the scale-correct form of streaming dedup (plain dropDuplicates keeps
    // state forever). Oracle = per-type counts of the deduped feed = the
    // plain events table.
    Q("stream_dedup",
      (s, dir) => withStatePartitions(s, 8) {
        val stage = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
        java.nio.file.Files.createSymbolicLink(
          stage.resolve("a.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
        java.nio.file.Files.createSymbolicLink(
          stage.resolve("b.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
        val schema = Registry.eventsRawSchema(s, dir)
        val src = Registry.normalizeEventsTs(
          s.readStream.schema(schema).parquet(stage.toString))
        val qname = "graft_stream_dedup"
        val q = src.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.outputMode("append")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname).groupBy("event_type").agg(count(lit(1)).as("n"))
      },
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type")),

    // Stream-stream interval join: clicks joined to purchases by the same
    // user within the following 2 hours — two independently staged
    // streaming sources, watermarks on both sides bound the join state.
    // Joined pairs land in a memory sink (append); the per-user counts are
    // a batch aggregate over it, oracle = the equivalent batch self-join.
    Q("stream_stream_join",
      (s, dir) => withStatePartitions(s, 8) {
        val clicks = Registry.eventsStream(s, dir)
          .filter(col("event_type") === "click")
          .withWatermark("ts", "3 hours")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        val purchases = Registry.eventsStream(s, dir)
          .filter(col("event_type") === "purchase")
          .withWatermark("ts", "3 hours")
          .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        val joined = clicks.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"))
        val qname = "graft_stream_join"
        val q = joined.select("user_id", "click_id", "purchase_id")
          .writeStream.outputMode("append")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname).groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""SELECT a.user_id, count(*) AS n_pairs
              |FROM events a JOIN events b
              |  ON a.user_id = b.user_id
              | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
              |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
              |GROUP BY a.user_id""".stripMargin)),

    // LEFT OUTER form of the interval join — the production funnel query
    // ("every click, with its conversions if any"): unmatched clicks must
    // be EMITTED (with nulls), not dropped, and that emission is
    // watermark-driven — an unmatched click leaves the state store only
    // when the watermark passes click_ts + join window. The finite feed is
    // closed in-band like stream_hourly_counts_append: sentinel rows staged
    // as two trailing mtime-ordered files. The sentinels must SURVIVE each
    // side's event_type filter (Catalyst pushes the filter below the
    // watermark node, so a filtered row never advances event time) — hence
    // one far-future click and one far-future purchase, on reserved
    // negative user ids that can never match a real row or each other;
    // their own outer rows never emit (the watermark cannot pass their own
    // window). Oracle = the equivalent batch LEFT JOIN: count(*) counts
    // pairs plus unmatched singles, count(purchase_id) only the matches.
    Q("stream_stream_left_join",
      (s, dir) => withStatePartitions(s, 8) {
        val ev = Registry.events(s, dir)
          .select("event_id", "ts", "user_id", "event_type")
        val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        val farTs = new java.sql.Timestamp(maxTs.getTime + 8L * 3600 * 1000)
        val sentinels = s.range(1).select(
            lit(-1L).as("event_id"), lit(farTs).as("ts"),
            lit(-1L).as("user_id"), lit("click").as("event_type"))
          .unionByName(s.range(1).select(
            lit(-2L).as("event_id"), lit(farTs).as("ts"),
            lit(-2L).as("user_id"), lit("purchase").as("event_type")))
        val stage = java.nio.file.Files.createTempDirectory("graft_ssl_join")
        val now = System.currentTimeMillis()
        stageParquetFile(stage, ev, "events.parquet", now - 120000)
        stageParquetFile(stage, sentinels, "sentinel1.parquet", now - 60000)
        stageParquetFile(stage, sentinels, "sentinel2.parquet", now)
        def side(tpe: String) = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          .withWatermark("ts", "1 hour")
          .filter(col("event_type") === tpe)
        val clicks = side("click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        val purchases = side("purchase")
          .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        val joined = clicks.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"),
          "left_outer")
        val qname = "graft_stream_left_join"
        val q = joined.select("user_id", "click_id", "purchase_id")
          .writeStream.outputMode("append")
          .format("memory").queryName(qname)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname).filter(col("user_id") >= 0)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_rows"), count(col("purchase_id")).as("n_matched"))
      },
      Some("""SELECT a.user_id, count(*) AS n_rows, count(b.event_id) AS n_matched
              |FROM events a LEFT JOIN events b
              |  ON a.user_id = b.user_id AND b.event_type = 'purchase'
              | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
              |WHERE a.event_type = 'click'
              |GROUP BY a.user_id""".stripMargin)),

    // Streaming recurring-ingest near-dup detection: the documents corpus
    // arrives as 3 micro-batches (maxFilesPerTrigger=1 over a 3-file
    // stage), and each batch's foreachBatch constructs a FRESH
    // DurableMinHashIndex over a shared stateDir and probes/appends — the
    // streaming form of pipeline_incremental_ingest_durable, where every
    // micro-batch is effectively a restarted process reading the LSH index
    // off disk. Batch membership is any disjoint split (a pair surfaces
    // exactly once, when its later-arriving member lands), so the union of
    // per-batch probe outputs must recover the full exact pair set —
    // gated by the same exact-Jaccard oracle as the batch variants.
    Q("stream_ingest_dedup",
      (s, dir) => withStatePartitions(s, 8) {
        val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
        val feedDir = java.nio.file.Files.createTempDirectory("graft_ingest_feed").toString
        docs.repartition(3, pmod(col("doc_id"), lit(3)))
          .write.mode("overwrite").parquet(feedDir)
        val state = java.nio.file.Files.createTempDirectory("graft_ingest_state").toString
        val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
        val src = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir)
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val idx = new graft.ops.DurableMinHashIndex(batch.sparkSession, state,
              shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
              maxBucketSize = Some(1000L))
            val pairs = idx.ingest(batch, "doc_id", "text").select("id_a", "id_b")
            pairs.write.mode("append").parquet(outDir)
            graft.ops.Caching.release(pairs)
            // Self-maintenance: compact when the append-only store passes a
            // file-count threshold, so the recurring loop never needs an
            // out-of-band maintenance job. Each ingest appends ≥1 bucket
            // file, so 2 fires at least once mid-stream on the 3-batch feed
            // (compaction preserves probe results — DurableDedupIndexSpec).
            idx.compactIfNeeded(maxStoreFiles = 2): Unit
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // Explicit schema: a corpus with zero near-dup pairs leaves outDir
        // with no files, and a schema-inferring read would reject it.
        val found = s.read.schema("id_a BIGINT, id_b BIGINT").parquet(outDir)
        TextQueries.incrementalRecallGate(s, dir, found)
      },
      Some(TextQueries.incrementalIngestOracle)),

    // Streaming embedding feed → persisted IVF index: each micro-batch
    // APPENDS against the saved centroids (O(batch) — no re-train), a
    // metadata-only file-count policy compacts the accreted small files
    // mid-stream (preserving the cell partitioning the search prunes on),
    // and the post-stream search must find every planted clone. The
    // vector-index twin of stream_ingest_dedup's restartable ingest loop.
    Q("stream_ingest_vecindex",
      (s, dir) => {
        import s.implicits._
        val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val clones = emb.filter(col("vec_id") < 5)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x * lit(1.01f)).otherwise(x)).as("embedding"))
        val base = emb.filter(col("vec_id") >= 5)
        val idx = java.nio.file.Files.createTempDirectory("graft_vecidx_stream").toString
        graft.ops.VectorIndex.build(base, idx, nCells = 16)
        // scale-robust policy anchor: the post-build count, not a constant
        // (build's file count varies with SF and task layout)
        val built = graft.ops.VectorIndex.dataFiles(s, idx)
        val feedDir = java.nio.file.Files.createTempDirectory("graft_vec_feed").toString
        clones.repartition(3, pmod(col("vec_id"), lit(3)))
          .write.mode("overwrite").parquet(feedDir)
        var compactions = 0
        val src = s.readStream.schema(clones.schema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir)
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            graft.ops.VectorIndex.append(batch, idx)
            // every append adds >=1 file, so this fires on the first batch
            // past the anchor and the loop self-maintains
            if (graft.ops.VectorIndex.compactIfNeeded(batch.sparkSession, idx,
                maxDataFiles = built + 1, targetBytes = 64L << 20))
              compactions += 1
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val approx = graft.ops.VectorIndex.search(queries, idx, k = 10, nProbe = 4)
        val cloneHits = approx.filter(col("vec_id") === col("q_id") + 10000000L)
          .select(col("q_id")).distinct().count()
        Seq((queries.count(), cloneHits, compactions >= 1))
          .toDF("n_queries", "clones_found", "compacted")
      },
      Some("""SELECT 5::BIGINT AS n_queries, 5::BIGINT AS clones_found,
              | true AS compacted""".stripMargin)),

    // Streaming ingest → MANIFESTED TABLE: each micro-batch appends its
    // files to the table and commits an INCREMENTAL snapshot (only the
    // batch's own files scanned — the O(batch) streaming-table commit,
    // never O(table)), while a DOWNSTREAM consumer rides the snapshot
    // history via addedSince from its own checkpoint, reading each batch's
    // rows exactly once. The streaming write side of the table-format
    // loop: the final table is read back through the PUBLIC
    // spark.read.format("graft") surface. Gates: fingerprint ≡ DuckDB over
    // the source rows, one snapshot per data batch, per-batch incremental
    // evidence (filesScanned == that batch's own files, strictly fewer
    // than the table's), and the consumer's accumulated rows == the table.
    Q("stream_ingest_manifest",
      (s, dir) => {
        import s.implicits._
        val oCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
        val orders = T(s, dir, "orders").select(oCols.map(col): _*)
        val feedDir = java.nio.file.Files.createTempDirectory("graft_mfeed").toString
        orders.repartition(4, pmod(col("o_orderkey"), lit(4)))
          .write.mode("overwrite").parquet(feedDir)
        val table = java.nio.file.Files.createTempDirectory("graft_mtab").toString + "/orders"
        var lastId: Option[Int] = None
        var consumed = 0L
        var batches = 0
        var incrementalOk = true
        val src = s.readStream.schema(orders.schema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir)
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val sb = batch.sparkSession
            // A trailing NO-DATA batch must not commit: an empty append +
            // snapshot would be pure metadata debt (and the no-op-cycle
            // contract elsewhere is "nothing changed ⇒ nothing commits").
            if (!batch.isEmpty) {
            // one file per micro-batch here (production appends land >=1
            // per writer task; the evidence below is scanned == own files)
            batch.repartition(1).write.mode("append").parquet(table)
            val (id, scanned, removed) =
              graft.ops.Manifest.createIncremental(sb, table, "o_orderkey")
            batches += 1
            // Incremental evidence: past the priming batch, the commit
            // scans EXACTLY the appended file — never the table.
            incrementalOk &&= removed == 0 &&
              (if (batches == 1) scanned == 1 else scanned == 1 && scanned < batches)
            // Downstream consumer: file-granular catch-up from ITS
            // checkpoint (the priming batch reads snapshot 1 whole).
            val fresh = lastId match {
              case None => graft.ops.Manifest.readAsOf(sb, table, id)
              case Some(prev) => graft.ops.Manifest.addedSince(sb, table, prev)._1
            }
            consumed += fresh.count()
            lastId = Some(id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val back = s.read.format("graft").load(table)
        graft.functions.Hashing.multisetFingerprintAgg(
            back.select(oCols.map(col): _*), oCols)
          .select(col("fingerprint"), col("n_rows"),
            // one snapshot per DATA batch (ids are dense from 1), and at
            // least two batches so incrementality was actually exercised —
            // the feed's file count is AQE-dependent, so the contract is
            // structural, not a fixture constant
            lit(lastId.contains(batches) && batches >= 2).as("one_snapshot_per_batch"),
            lit(incrementalOk).as("incremental_commits"),
            (lit(consumed) === col("n_rows")).as("consumer_exactly_once"))
      },
      Some {
        val oCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
        s"""SELECT fingerprint, n_rows, true AS one_snapshot_per_batch,
           | true AS incremental_commits, true AS consumer_exactly_once
           |FROM (${Registry.duckMultisetFingerprint(oCols, "orders")})""".stripMargin
      }),

    // Stateful custom-state operator: flatMapGroupsWithState sessionization
    // (30-minute gap). Oracle = the equivalent batch lag/cumsum windows.
    Q("stream_sessionize",
      (s, dir) => withStatePartitions(s, 8) {
        // Session bounds surface as epoch-MICROS bigints, not timestamps:
        // they carry real sub-second parts (unlike the hour-truncated
        // windows elsewhere), and timestamp-with-micros string forms differ
        // across compare harnesses (ns-padding / T-separators); integers
        // hash identically everywhere.
        graft.streaming.Sessionize.runAvailableNow(
            Registry.eventsStream(s, dir), gapSeconds = 1800, queryName = "graft_sessions")
          .select(col("user_id"), col("session_id"), col("n_events"),
            unix_micros(col("t_start")).as("t_start_us"),
            unix_micros(col("t_end")).as("t_end_us"))
      },
      Some("""WITH e AS (
              |  SELECT user_id, event_id, ts,
              |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |  FROM events),
              | f AS (SELECT user_id, event_id, ts,
              |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS new_s
              |  FROM e),
              | g AS (SELECT user_id, ts,
              |    cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as bigint) AS session_id
              |  FROM f)
              |SELECT user_id, session_id, count(*) AS n_events,
              |  epoch_us(min(ts)) AS t_start_us, epoch_us(max(ts)) AS t_end_us
              |FROM g GROUP BY user_id, session_id""".stripMargin)),

    // Bounded-state sessionization: same gap semantics, same oracle, but
    // state is EventTimeTimeout-bounded — a session whose close instant
    // (t_end + gap) the watermark passes is emitted once and its state row
    // DELETED, so a continuous feed holds state only for users active
    // within one gap+delay horizon (the NoTimeout variant above retains
    // every user ever seen). The finite feed is flushed by two sentinel
    // batches (user_id -1, filtered out): the first advances the watermark
    // past every real close instant, the second is the data batch under
    // that watermark in which the timeouts actually fire — the same
    // two-sentinel shape as stream_hourly_counts_append. End state =
    // exactly the sentinel user's own open session (asserted in
    // StreamingSpec).
    Q("stream_sessionize_bounded",
      (s, dir) => withStatePartitions(s, 8) {
        val ev = Registry.events(s, dir).select(col("user_id"), col("event_id"), col("ts"))
        val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        // Sentinel ts: watermark after its batch (ts - 30 min) must clear
        // maxTs + gap (30 min) — +2 h clears it with an hour to spare.
        val sentinel = s.range(1).select(
          lit(-1L).cast(ev.schema("user_id").dataType).as("user_id"),
          lit(0L).cast(ev.schema("event_id").dataType).as("event_id"),
          lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)).as("ts"))
        val stage = java.nio.file.Files.createTempDirectory("graft_sess_bounded")
        val now = System.currentTimeMillis()
        stageParquetFile(stage, ev, "events.parquet", now - 120000)
        stageParquetFile(stage, sentinel, "sentinel1.parquet", now - 60000)
        stageParquetFile(stage, sentinel, "sentinel2.parquet", now)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        val run = graft.streaming.Sessionize.runAvailableNowBounded(
          src.withWatermark("ts", "30 minutes"), gapSeconds = 1800,
          queryName = "graft_sessions_bounded")
        run.sessions.filter(col("user_id") >= 0)
          .select(col("user_id"), col("session_id"), col("n_events"),
            unix_micros(col("t_start")).as("t_start_us"),
            unix_micros(col("t_end")).as("t_end_us"))
      },
      Some("""WITH e AS (
              |  SELECT user_id, event_id, ts,
              |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |  FROM events),
              | f AS (SELECT user_id, event_id, ts,
              |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS new_s
              |  FROM e),
              | g AS (SELECT user_id, ts,
              |    cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as bigint) AS session_id
              |  FROM f)
              |SELECT user_id, session_id, count(*) AS n_events,
              |  epoch_us(min(ts)) AS t_start_us, epoch_us(max(ts)) AS t_end_us
              |FROM g GROUP BY user_id, session_id""".stripMargin)),

    // ---- the NATIVE streaming source over the table format:
    //      spark.readStream.format("graft") rides snapshot history with a
    //      checkpointed snapshot-id cursor (the Delta streaming-source
    //      posture) — replacing the hand-rolled addedSince consumer with
    //      engine plumbing. Three AvailableNow runs against one checkpoint:
    //      (1) full latest snapshot (load-then-stream), (2) after an append
    //      + a COMPACTION that rewrites every file — only the appended rows
    //      arrive (rewritten rows cancel in the snapshot diff; a file-diff
    //      source would re-deliver the table), (3) idle — nothing. Gates:
    //      accumulated fingerprint ≡ DuckDB over the full table (any
    //      re-delivery or loss flips count/sum/xor), initial batch strictly
    //      smaller than the total.
    Q("stream_graft_source",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = T(s, dir, "documents")
        val table = java.nio.file.Files.createTempDirectory("graft_gstream")
          .toString + "/documents"
        docs.filter(col("doc_id") % 3 =!= 0).repartition(4).write.parquet(table)
        graft.ops.Manifest.create(s, table, "doc_id")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_gstream_ck").toString
        var acc = graft.functions.Hashing.MultisetFp(0L, BigInt(0), 0L)
        def runOnce(): Unit = {
          val q = s.readStream.format("graft").load(table)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              if (!b.isEmpty)
                acc = acc.merge(graft.functions.Hashing.multisetFp(b, docCols))
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        runOnce()
        val firstN = acc.count
        docs.filter(col("doc_id") % 3 === 0).repartition(2)
          .write.mode("append").parquet(table)
        graft.ops.Manifest.createIncremental(s, table, "doc_id")
        graft.ops.Layout.compactTable(s, table, targetBytes = 64L << 20)
        runOnce() // only the appended rows — compaction is silent
        runOnce() // idle restart delivers nothing
        import s.implicits._
        Seq((acc.render, acc.count, firstN > 0 && firstN < acc.count))
          .toDF("fingerprint", "n_rows", "initial_then_stream")
      },
      Some(s"""SELECT fingerprint, n_rows, true AS initial_then_stream FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "documents")})""".stripMargin)),

    // ---- the NATIVE streaming sink: writeStream.format("graft") appends
    //      each micro-batch to the manifested table EXACTLY ONCE via the
    //      snapshot ledger (txnAppId × batch id, published atomically with
    //      every snapshot commit — the Delta txnAppId/txnVersion posture).
    //      Two AvailableNow runs against one checkpoint land the corpus in
    //      single-file micro-batches; a deliberate REPLAY of an already-
    //      committed batch id must dedup (-1) and an idle restart commits
    //      nothing. Gates: table fingerprint ≡ DuckDB over the full corpus
    //      (any duplicate or lost batch flips count/sum/xor), replay
    //      deduped, ledger recorded, manifest complete.
    Q("stream_graft_sink",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = T(s, dir, "documents").select(docCols.map(col): _*)
        val table = java.nio.file.Files.createTempDirectory("graft_gsink")
          .toString + "/documents"
        graft.ops.Manifest.createEmpty(s, table, docs.schema, Seq("doc_id"))
        val feed = java.nio.file.Files.createTempDirectory("graft_gsink_feed").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_gsink_ck").toString
        def runOnce(): Unit = {
          val q = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(feed)
            .writeStream.format("graft")
            .option("path", table).option("txnAppId", "graft_gsink_q")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        docs.filter(col("doc_id") % 3 === 0).repartition(1)
          .write.mode("append").parquet(feed)
        runOnce()
        docs.filter(col("doc_id") % 3 =!= 0).repartition(2)
          .write.mode("append").parquet(feed)
        runOnce()
        // Replay an already-committed batch id straight at the engine —
        // the ledger must dedup it (the crash-replay path, deterministic).
        val deduped = graft.ops.Layout.appendOnce(
          s, table, "graft_gsink_q", 0L, docs.limit(5)) == -1L
        val snapBefore = graft.ops.Manifest.latestSnapshotId(s, table).get
        runOnce() // idle restart commits nothing
        val idleSilent =
          graft.ops.Manifest.latestSnapshotId(s, table).contains(snapBefore)
        graft.functions.Hashing.multisetFingerprintAgg(
            s.read.parquet(table), docCols)
          .withColumn("replay_deduped", lit(deduped))
          .withColumn("idle_silent", lit(idleSilent))
          .withColumn("ledger_ok", lit(graft.ops.Manifest
            .txnVersion(s, table, "graft_gsink_q").exists(_ >= 1L)))
          .withColumn("complete", lit(graft.ops.Manifest.isComplete(s, table)))
      },
      Some(s"""SELECT *, true AS replay_deduped, true AS idle_silent,
               | true AS ledger_ok, true AS complete FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "documents")})""".stripMargin)),

    // ---- the UPSERT streaming sink: Update output mode + mergeKey routes
    //      each micro-batch through the exactly-once keyed COW merge
    //      (Layout.mergeKeyedOnce — same writer-transaction ledger as the
    //      append sink, published atomically with the merge's snapshot
    //      commit). Fixture: the table holds the corpus's lower half; batch
    //      1 updates the lowest eighth and inserts the upper half; batch 2
    //      re-updates the lowest sixteenth — the reference's "run
    //      frequently" converge loop, natively end to end. Gate: final
    //      fingerprint ≡ DuckDB computing the same overlay, replayed batch
    //      deduped, idle restart silent, zero duplicated keys.
    Q("stream_graft_sink_upsert",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = T(s, dir, "documents").select(docCols.map(col): _*)
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val table = java.nio.file.Files.createTempDirectory("graft_gsup")
          .toString + "/documents"
        docs.filter(col("doc_id") < mx / 2).repartitionByRange(4, col("doc_id"))
          .write.parquet(table)
        graft.ops.Manifest.create(s, table, "doc_id")
        val feed = java.nio.file.Files.createTempDirectory("graft_gsup_feed").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_gsup_ck").toString
        def runOnce(): Unit = {
          val q = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(feed)
            .writeStream.format("graft").outputMode("update")
            .option("path", table).option("txnAppId", "graft_gsup_q")
            .option("mergeKey", "doc_id")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // Batch 1: updates (lowest eighth, 'u:' text) + inserts (upper half).
        docs.filter(col("doc_id") < mx / 8)
          .withColumn("text", concat(lit("u:"), col("text")))
          .unionByName(docs.filter(col("doc_id") >= mx / 2))
          .repartition(1).write.mode("append").parquet(feed)
        runOnce()
        // Batch 2: re-update the lowest sixteenth ('v:' over the original).
        docs.filter(col("doc_id") < mx / 16)
          .withColumn("text", concat(lit("v:"), col("text")))
          .repartition(1).write.mode("append").parquet(feed)
        runOnce()
        // Replay an already-committed batch id straight at the engine.
        val deduped = graft.ops.Layout.mergeKeyedOnce(
          s, table, "doc_id", "graft_gsup_q", 0L, docs.limit(5))
          .filesRewritten == -1
        val snapBefore = graft.ops.Manifest.latestSnapshotId(s, table).get
        runOnce() // idle restart commits nothing
        val idleSilent =
          graft.ops.Manifest.latestSnapshotId(s, table).contains(snapBefore)
        val t = s.read.parquet(table)
        val noDups = t.count() == t.select("doc_id").distinct().count()
        graft.functions.Hashing.multisetFingerprintAgg(t, docCols)
          .withColumn("replay_deduped", lit(deduped))
          .withColumn("idle_silent", lit(idleSilent))
          .withColumn("no_dup_keys", lit(noDups))
          .withColumn("complete", lit(graft.ops.Manifest.isComplete(s, table)))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents),
               | final AS (SELECT doc_id,
               |   CASE WHEN doc_id < b.mx // 16 THEN 'v:' || text
               |        WHEN doc_id < b.mx // 8 THEN 'u:' || text
               |        ELSE text END AS text,
               |   lang, source, n_chars FROM documents, b)
               |SELECT *, true AS replay_deduped, true AS idle_silent,
               | true AS no_dup_keys, true AS complete FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final t")})""".stripMargin)),

    // ---- MERGE-ON-READ streaming upsert (mergeMode=dv): each Update-mode
    //      micro-batch lands as deletion-vector positions (matched old
    //      versions) + appended files (the whole batch) in ONE atomic
    //      commit — ZERO data files rewritten per trigger, where the COW
    //      upsert pays file-size × touched-files per batch at minute-level
    //      CDC cadence. compactDeletesEvery folds the sidecar on a batch
    //      cadence. Gate: untouched-file mtimes stable across the DV batch,
    //      vector present before the policy fold and folded after it,
    //      replay deduped, idle restart silent, final fingerprint ≡ DuckDB
    //      (same end state as the COW upsert fixture).
    Q("stream_graft_sink_upsert_dv",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = T(s, dir, "documents").select(docCols.map(col): _*)
        val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
        val table = java.nio.file.Files.createTempDirectory("graft_gsdv")
          .toString + "/documents"
        docs.filter(col("doc_id") < mx / 2).repartitionByRange(4, col("doc_id"))
          .write.parquet(table)
        graft.ops.Manifest.create(s, table, "doc_id")
        val feed = java.nio.file.Files.createTempDirectory("graft_gsdv_feed").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_gsdv_ck").toString
        val fs = new org.apache.hadoop.fs.Path(table)
          .getFileSystem(s.sessionState.newHadoopConf())
        def stamps(): Map[String, Long] = {
          val out = Map.newBuilder[String, Long]
          graft.ops.FsMaint.walkFiles(fs, new org.apache.hadoop.fs.Path(table)) { st =>
            val p = st.getPath.toUri.getPath
            if (st.getPath.getName.startsWith("part-") && !p.contains("_graft"))
              out += p -> st.getModificationTime
            true
          }
          out.result()
        }
        def runOnce(): Unit = {
          val q = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(feed)
            .writeStream.format("graft").outputMode("update")
            .option("path", table).option("txnAppId", "graft_gsdv_q")
            .option("mergeKey", "doc_id")
            .option("mergeMode", "dv")
            .option("compactDeletesEvery", "2")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // Batch 0: updates (lowest eighth, 'u:') + inserts (upper half) —
        // must land as DV + append, existing data files untouched.
        val before = stamps()
        docs.filter(col("doc_id") < mx / 8)
          .withColumn("text", concat(lit("u:"), col("text")))
          .unionByName(docs.filter(col("doc_id") >= mx / 2))
          .repartition(1).write.mode("append").parquet(feed)
        runOnce()
        val afterB0 = stamps()
        val zeroRewrites = before.toSet.subsetOf(afterB0.toSet)
        val dvAfterB0 = graft.ops.Manifest.hasDv(s, table,
          graft.ops.Manifest.latestSnapshotId(s, table).get)
        // Batch 1: re-update the lowest sixteenth ('v:') — its matched old
        // versions live in batch 0's appended files. batchId 1 hits the
        // compactDeletesEvery=2 cadence → the sidecar folds.
        docs.filter(col("doc_id") < mx / 16)
          .withColumn("text", concat(lit("v:"), col("text")))
          .repartition(1).write.mode("append").parquet(feed)
        runOnce()
        val foldedAfterB1 = !graft.ops.Manifest.hasDv(s, table,
          graft.ops.Manifest.latestSnapshotId(s, table).get)
        // Replay an already-committed batch id straight at the engine.
        val deduped = graft.ops.Layout.mergeKeyedDvOnce(
          s, table, "doc_id", "graft_gsdv_q", 0L, docs.limit(5))
          .filesRewritten == -1
        val snapBefore = graft.ops.Manifest.latestSnapshotId(s, table).get
        runOnce() // idle restart commits nothing
        val idleSilent =
          graft.ops.Manifest.latestSnapshotId(s, table).contains(snapBefore)
        val t = graft.ops.Manifest.readAsOf(s, table,
          graft.ops.Manifest.latestSnapshotId(s, table).get)
        val noDups = t.count() == t.select("doc_id").distinct().count()
        graft.functions.Hashing.multisetFingerprintAgg(t, docCols)
          .withColumn("zero_rewrites_dv", lit(zeroRewrites && dvAfterB0))
          .withColumn("policy_folded", lit(foldedAfterB1))
          .withColumn("replay_deduped", lit(deduped))
          .withColumn("idle_silent", lit(idleSilent))
          .withColumn("no_dup_keys", lit(noDups))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents),
               | final AS (SELECT doc_id,
               |   CASE WHEN doc_id < b.mx // 16 THEN 'v:' || text
               |        WHEN doc_id < b.mx // 8 THEN 'u:' || text
               |        ELSE text END AS text,
               |   lang, source, n_chars FROM documents, b)
               |SELECT *, true AS zero_rewrites_dv, true AS policy_folded,
               | true AS replay_deduped, true AS idle_silent,
               | true AS no_dup_keys FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "final t")})""".stripMargin)),

    // ---- streaming-source OPTIONS: startingSnapshotId (no initial load —
    //      the Delta startingVersion posture), withChanges (the tagged
    //      row-level feed as a STREAM, deletes included), and
    //      maxSnapshotsPerTrigger (bounded catch-up: each AvailableNow run
    //      advances at most N snapshots). Fixture: snapshot 1 = full corpus,
    //      snapshot 2 = a COW delete, snapshot 3 = an append; the stream
    //      starts AFTER snapshot 1 and catches up in two rate-limited runs.
    //      Gate: replaying the streamed feed (inserts minus deletes) onto
    //      the snapshot-1 state ≡ DuckDB computing the same end state, and
    //      the catch-up took exactly 2 single-snapshot batches.
    Q("stream_graft_backfill",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = T(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val lo = maxId / 4; val hi = maxId / 2
        val table = java.nio.file.Files.createTempDirectory("graft_gsbf")
          .toString + "/documents"
        docs.repartitionByRange(6, col("doc_id")).write.parquet(table)
        val id1 = graft.ops.Manifest.create(s, table, "doc_id")
        graft.ops.Layout.deleteRange(s, table, "doc_id", lo, hi) // snapshot 2
        docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + maxId + 1)
          .write.mode("append").parquet(table)
        graft.ops.Manifest.createIncremental(s, table, "doc_id") // snapshot 3
        val ckpt = java.nio.file.Files.createTempDirectory("graft_gsbf_ck").toString
        var ins = graft.functions.Hashing.MultisetFp(0L, BigInt(0), 0L)
        var del = graft.functions.Hashing.MultisetFp(0L, BigInt(0), 0L)
        val batches = new java.util.concurrent.atomic.AtomicInteger(0)
        def runOnce(): Unit = {
          val q = s.readStream.format("graft")
            .option("startingSnapshotId", id1)
            .option("maxSnapshotsPerTrigger", 1)
            .option("withChanges", "true")
            .load(table)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              if (!b.isEmpty) {
                batches.incrementAndGet()
                val i = b.filter(col("change") === "insert").drop("change")
                val d = b.filter(col("change") === "delete").drop("change")
                if (!i.isEmpty) ins = ins.merge(
                  graft.functions.Hashing.multisetFp(i, docCols))
                if (!d.isEmpty) del = del.merge(
                  graft.functions.Hashing.multisetFp(d, docCols))
              }
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        runOnce(); runOnce(); runOnce() // 2 catch-up steps + 1 idle
        // Replay the feed onto the snapshot-1 state: multiset fingerprints
        // compose (count/sum add, xor cancels), so start + inserts - deletes
        // must equal the live table exactly.
        val base = graft.functions.Hashing.multisetFp(
          graft.ops.Manifest.readAsOf(s, table, id1), docCols)
        val applied = base.merge(ins).remove(del)
        import s.implicits._
        Seq((applied.render, applied.count, batches.get() == 2))
          .toDF("fingerprint", "n_rows", "two_bounded_batches")
      },
      Some(s"""WITH b AS (SELECT max(doc_id) // 4 AS lo, max(doc_id) // 2 AS hi,
               |                  max(doc_id) AS mx FROM documents),
               | fin AS (
               |  SELECT d.* FROM documents d, b WHERE d.doc_id NOT BETWEEN b.lo AND b.hi
               |  UNION ALL
               |  SELECT doc_id + b.mx + 1, text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < 10)
               |SELECT fingerprint, n_rows, true AS two_bounded_batches FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "fin t")})""".stripMargin))
  )

  private object StreamSyncHolder {
    def run(feed: org.apache.spark.sql.DataFrame, slave: graft.sync.TableStore): Unit = {
      val q = graft.streaming.StreamSync.applyChangeFeed(
        feed, slave, "lineitem", Seq("l_orderkey", "l_linenumber"))
      q.awaitTermination()
    }
  }
}
