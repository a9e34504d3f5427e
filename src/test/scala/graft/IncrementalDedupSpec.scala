package graft

import graft.ops.{Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Incremental near-dup probe, per-doc duplicate-shingle stats, and the
  * exact-count stratified sampler.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // base: 1/2 near-dup of each other (base–base: must NOT be reported),
  // 3 unrelated. incoming: 11 near-dup of both base docs, 12/13 near-dups
  // of each other (new–new: must be reported), 14 unrelated.
  private def base = Seq(
    (1L, "a b c d e f g x"),
    (2L, "a b c d e f g y"),
    (3L, "p q r s t u v w")).toDF("doc_id", "text")
  private def incoming = Seq(
    (11L, "a b c d e f g z"),
    (12L, "m n o aa bb cc dd ee"),
    (13L, "m n o aa bb cc dd ff"),
    (14L, "completely different tokens only here")).toDF("doc_id", "text")

  test("incrementalNearDups reports only pairs touching the ingest batch") {
    val pairs = Dedup.incrementalNearDups(base, incoming, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 11L)) && pairs.contains((2L, 11L)),
      s"base-new near-dups missing: $pairs")
    assert(pairs.contains((12L, 13L)), s"new-new near-dup missing: $pairs")
    assert(!pairs.contains((1L, 2L)), "base-base pair must be absent")
    assert(pairs.forall { case (a, b) => a >= 11L || b >= 11L })
  }

  test("incrementalNearDups equals the full run restricted to batch-touching pairs") {
    val newIds = incoming.select("doc_id").as[Long].collect().toSet
    val full = Dedup.minhashNearDups(base.unionByName(incoming), "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => newIds(p._1) || newIds(p._2))
    val inc = Dedup.incrementalNearDups(base, incoming, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(inc == full)
  }

  test("duplicateShingleStats counts corpus-wide duplicated grams per doc") {
    val docs = Seq(
      (1L, "a b c d"), // grams {a b c, b c d}; "a b c" shared with doc 2
      (2L, "a b c e"),
      (3L, "z z z q"), // no shared grams
      (4L, ""),        // whole-text shingle '' — shared with doc 5
      (5L, "")).toDF("doc_id", "text")
    val got = Dedup.duplicateShingleStats(docs, "doc_id", "text", shingleK = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(got(4L) == ((1L, 1L, 1.0)))
    assert(got(5L) == ((1L, 1L, 1.0)))
  }

  test("stratifiedSample takes exactly n per stratum in deterministic hash order") {
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "s")
    val sampled = Sampling.stratifiedSample(df, "s", "id", n = 10)
      .select("s", "id").as[(String, Long)].collect()
    assert(sampled.length == 20)
    assert(sampled.count(_._1 == "even") == 10 && sampled.count(_._1 == "odd") == 10)
    // Expected selection: first 10 ids of each stratum under (bucket, id) order.
    val buckets = df.select(col("s"), col("id"), Sampling.hashBucket(col("id")).as("b"))
      .as[(String, Long, Long)].collect()
    val expected = buckets.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(10).map(r => (s, r._2)).toSeq
    }.toSet
    assert(sampled.toSet == expected)
    // Deterministic across runs.
    val again = Sampling.stratifiedSample(df, "s", "id", n = 10)
      .select("s", "id").as[(String, Long)].collect().toSet
    assert(again == sampled.toSet)
  }

  test("leakageSafeSplit keeps every cluster inside one split") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // Chain pairs clustering ids into groups of 4: (0,1,2,3), (4,5,6,7), …
    val pairs = (0L until 200L).filter(i => i % 4 != 3)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = graft.ops.Cluster.dedupClusters(pairs).select("id", "cluster_id")
    val split = Sampling.leakageSafeSplit(docs, "doc_id", clusters,
        trainBps = 8000, valBps = 1000)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.size == 200)
    // All members of a group share the root's split.
    (0L until 200L).foreach { i => assert(split(i) == split(i / 4 * 4), s"doc $i") }
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(split.values.toSet.size > 1, "fixture should hit multiple splits")
  }
}
