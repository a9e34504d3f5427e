package graft

import graft.ops.{Dedup, DurableMinHashIndex}
import graft.queries.Registry
import org.apache.spark.sql.functions._

/** DurableMinHashIndex: the persisted band-bucket index must (a) find the
  * same pairs as the in-memory incremental probe, and (b) survive a
  * restart — a FRESH instance over the same stateDir probes batch 3
  * against batches 1–2 purely from disk, never being handed the base
  * corpus (`ingest` has no base parameter; that is the restart proof).
  */
class DurableDedupIndexSpec extends SparkSpec {

  private def docs = Registry.table(spark, sf001, "documents")
    .select(col("doc_id"), col("text"))

  private def batch(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-round durable ingest finds the same pairs as the in-memory incremental probe") {
    val state = tmpDir("dedup_idx")
    val durable = (0 until 3).map { i =>
      val idx = new DurableMinHashIndex(spark, state,
        shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4)
      pairs(idx.ingest(batch(i), "doc_id", "text"))
    }.reduce(_ ++ _)
    val inMemory = (0 until 3).map { i =>
      pairs(Dedup.incrementalNearDups(
        docs.filter(pmod(col("doc_id"), lit(3)) < i), batch(i),
        "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    }.reduce(_ ++ _)
    assert(durable == inMemory)
    assert(durable.nonEmpty)
  }

  test("a restarted instance probes base batches from disk only") {
    val state = tmpDir("dedup_idx_restart")
    // "Process 1": ingest batches 0 and 1.
    (0 until 2).foreach { i =>
      new DurableMinHashIndex(spark, state, shingleK = 3, numHashes = 32,
        bands = 16, threshold = 0.4).ingest(batch(i), "doc_id", "text").count()
    }
    // "Process 2" (restart): a fresh instance, handed ONLY batch 2.
    val found = pairs(new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
      .ingest(batch(2), "doc_id", "text"))
    val expected = pairs(Dedup.incrementalNearDups(
      docs.filter(pmod(col("doc_id"), lit(3)) < 2), batch(2),
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    assert(found == expected)
    // Cross-batch pairs exist: state genuinely came off disk.
    val batch2Ids = batch(2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(found.exists { case (a, b) => !batch2Ids(a) || !batch2Ids(b) })
  }

  test("shingle store is hash-partitioned for pruned keyed lookups") {
    val state = tmpDir("dedup_idx_layout")
    new DurableMinHashIndex(spark, state, shingleK = 3, numHashes = 32,
      bands = 16, threshold = 0.4, idBuckets = 8)
      .ingest(batch(0), "doc_id", "text").count()
    val parts = new java.io.File(s"$state/shingles").listFiles()
      .filter(_.getName.startsWith("id_bucket="))
    assert(parts.nonEmpty && parts.length <= 8)
  }

  private def dataFiles(dir: java.io.File): Seq[java.io.File] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.filter(f => f.isFile && f.getName.startsWith("part-")).toSeq ++
      fs.filter(_.isDirectory).flatMap(dataFiles)
  }

  test("compact preserves probe results, drops retry duplicates, and shrinks the store") {
    val state = tmpDir("dedup_idx_compact")
    def idx() = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
    idx().ingest(batch(0), "doc_id", "text").count()
    idx().ingest(batch(1), "doc_id", "text").count()
    // Simulated crash-retry: batch 1 appends AGAIN — duplicate bucket and
    // shingle rows now sit in the store.
    idx().ingest(batch(1), "doc_id", "text").count()
    val filesBefore = dataFiles(new java.io.File(state)).size
    idx().compact()
    val filesAfter = dataFiles(new java.io.File(state)).size
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    // No duplicate rows survive in either store.
    val b = spark.read.parquet(s"$state/buckets")
    assert(b.count() == b.distinct().count())
    val sh = spark.read.parquet(s"$state/shingles")
    assert(sh.count() == sh.select("id").distinct().count())
    // A post-compaction probe equals the direct incremental run over the
    // same (deduplicated) base — results are unchanged by compaction.
    val found = pairs(idx().ingest(batch(2), "doc_id", "text"))
    val expected = pairs(Dedup.incrementalNearDups(
      docs.filter(pmod(col("doc_id"), lit(3)) < 2), batch(2),
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    assert(found == expected)
    assert(found.nonEmpty)
  }

  test("an interrupted compact swap is healed before the next ingest") {
    val state = tmpDir("dedup_idx_heal")
    def idx() = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
    idx().ingest(batch(0), "doc_id", "text").count()
    idx().ingest(batch(1), "doc_id", "text").count()
    // Simulate a compact that died between its two renames: the store is
    // moved aside and the replacement never landed.
    val buckets = new java.io.File(s"$state/buckets")
    assert(buckets.renameTo(new java.io.File(s"$state/buckets__old")))
    val found = pairs(idx().ingest(batch(2), "doc_id", "text"))
    val expected = pairs(Dedup.incrementalNearDups(
      docs.filter(pmod(col("doc_id"), lit(3)) < 2), batch(2),
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    assert(found == expected)
    assert(found.nonEmpty)
  }

  test("ingest/compact/heal run against a file: URI stateDir (Hadoop FileSystem path)") {
    // State maintenance resolves a Hadoop FileSystem from the stateDir URI;
    // an explicit scheme-qualified path exercises the exact API surface an
    // HDFS deployment would (exists/listFiles/rename/delete on
    // org.apache.hadoop.fs.FileSystem), with LocalFileSystem as the impl.
    val local = tmpDir("dedup_idx_hdfs_api")
    val state = "file:" + local
    def idx() = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
    idx().ingest(batch(0), "doc_id", "text").count()
    idx().ingest(batch(1), "doc_id", "text").count()
    idx().ingest(batch(1), "doc_id", "text").count() // crash-retry dup
    idx().compact()
    val b = spark.read.parquet(s"$state/buckets")
    assert(b.count() == b.distinct().count())
    // Interrupted-swap healing through the same FileSystem:
    val buckets = new java.io.File(s"$local/buckets")
    assert(buckets.renameTo(new java.io.File(s"$local/buckets__old")))
    val found = pairs(idx().ingest(batch(2), "doc_id", "text"))
    val expected = pairs(Dedup.incrementalNearDups(
      docs.filter(pmod(col("doc_id"), lit(3)) < 2), batch(2),
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    assert(found == expected)
    assert(found.nonEmpty)
  }

  test("compactIfNeeded fires at the file-count threshold and not below") {
    val state = tmpDir("dedup_idx_policy")
    def idx() = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
    idx().ingest(batch(0), "doc_id", "text").count()
    // One ingest appended ≥1 bucket file but fewer than 100: below threshold.
    assert(!idx().compactIfNeeded(maxStoreFiles = 100))
    idx().ingest(batch(1), "doc_id", "text").count()
    idx().ingest(batch(1), "doc_id", "text").count() // retry dup to shrink
    val bucketsDir = new java.io.File(s"$state/buckets")
    val filesBefore = dataFiles(bucketsDir).size
    assert(filesBefore >= 2)
    // Threshold ≤ current count: the policy must trigger a real compaction.
    assert(idx().compactIfNeeded(maxStoreFiles = 2))
    assert(dataFiles(bucketsDir).size < filesBefore)
    val b = spark.read.parquet(s"$state/buckets")
    assert(b.count() == b.distinct().count())
    // Post-policy probe still correct.
    val found = pairs(idx().ingest(batch(2), "doc_id", "text"))
    val expected = pairs(Dedup.incrementalNearDups(
      docs.filter(pmod(col("doc_id"), lit(3)) < 2), batch(2),
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    assert(found == expected)
  }

  test("an empty first ingest leaves a probeable (empty) result, then state accrues") {
    val state = tmpDir("dedup_idx_empty")
    val idx0 = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
    assert(idx0.ingest(docs.limit(0), "doc_id", "text").count() == 0L)
    val idx1 = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4)
    // All docs in one batch: must find the full new–new pair set.
    val all = pairs(idx1.ingest(docs, "doc_id", "text"))
    val direct = pairs(Dedup.incrementalNearDups(docs.limit(0), docs,
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    assert(all == direct)
  }
}
