package graft

import graft.ops.{Dedup, DurableMinHashIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket cap semantics for the incremental LSH probes
  * (`Dedup.incrementalNearDups` / `DurableMinHashIndex.ingest`): exact
  * equivalence when no band bucket exceeds the cap, and bounded loss when
  * it is active — only pairs inside a giant near-identical (boilerplate)
  * cluster disappear, while content pairs keep their exact scores. The
  * bucket-level twin of DedupCapSpec's shingle-df cap.
  */
class DedupBucketCapSpec extends SparkSpec {
  import spark.implicits._

  // Two genuinely similar docs over RARE text (identical → jaccard 1.0,
  // identical minhash signatures → guaranteed band collision) plus a
  // 12-doc boilerplate cluster of one shared text: every band bucket of
  // the cluster holds all 12 docs, so any cap < 12 drops the cluster's
  // buckets while the content pair's 2-member buckets survive.
  private def fixture: DataFrame = {
    val content = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"))
    val boiler = (10L to 21L).map(i => (i, "shared boiler plate sentence repeated verbatim"))
    (content ++ boiler).toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val boilerPairs: Set[(Long, Long)] =
    (for (a <- 10L to 21L; b <- (a + 1) to 21L) yield (a, b)).toSet

  test("incremental probe: inactive cap is exactly equivalent to the uncapped run") {
    val empty = fixture.limit(0)
    val uncapped = pairs(Dedup.incrementalNearDups(empty, fixture, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4))
    val capped = pairs(Dedup.incrementalNearDups(empty, fixture, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
      maxBucketSize = Some(100L)))
    assert(capped == uncapped)
    assert(uncapped.contains((1L, 2L)))
    assert(boilerPairs.subsetOf(uncapped)) // C(12,2) boilerplate pairs present
  }

  test("incremental probe: active cap drops only boilerplate-cluster pairs") {
    val empty = fixture.limit(0)
    val capped = Dedup.incrementalNearDups(empty, fixture, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
      maxBucketSize = Some(8L))
    // The content pair survives with its EXACT score (its buckets hold 2
    // docs); every pair that existed only inside the 12-doc cluster's hot
    // buckets is gone — the candidate join never materialized them.
    val got = capped.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 1.0)), s"got: $got")
  }

  test("durable probe: active cap drops cluster pairs across persisted batches") {
    val state = tmpDir("dedup_cap_durable")
    def idx() = new DurableMinHashIndex(spark, state, shingleK = 3,
      numHashes = 32, bands = 16, threshold = 0.4, maxBucketSize = Some(8L))
    // Batch 1: content doc 1 + half the cluster (6 members — bucket size 6
    // ≤ 8, so batch-1-internal cluster pairs surface normally); batch 2:
    // content doc 2 + the other half, which pushes every cluster bucket to
    // 12 > 8. The cap is data-driven: it engages exactly when the
    // persisted bucket crosses it.
    val b1 = fixture.filter(col("doc_id") === 1L ||
      (col("doc_id") >= 10L && col("doc_id") <= 15L))
    val b2 = fixture.filter(col("doc_id") === 2L || col("doc_id") > 15L)
    val p1 = pairs(idx().ingest(b1, "doc_id", "text"))
    val p2 = pairs(idx().ingest(b2, "doc_id", "text"))
    // Ingest 1: the under-cap half-cluster pairs freely.
    assert(p1 == (for (a <- 10L to 15L; b <- (a + 1) to 15L) yield (a, b)).toSet)
    // Ingest 2: every cluster bucket is now hot — no new cluster pairs;
    // the content pair (split across batches) still lands via its
    // 2-member buckets.
    assert(p2 == Set((1L, 2L)), s"got: $p2")
  }

  test("durable probe: inactive cap equals the uncapped durable run") {
    val clean = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely different words about another topic entirely"),
      (4L, "completely different words about another topic indeed")).toDF("doc_id", "text")
    def run(cap: Option[Long], tag: String): Set[(Long, Long)] = {
      val state = tmpDir(s"dedup_cap_eq_$tag")
      val b1 = clean.filter(col("doc_id") <= 2L)
      val b2 = clean.filter(col("doc_id") > 2L)
      def idx() = new DurableMinHashIndex(spark, state, shingleK = 3,
        numHashes = 32, bands = 16, threshold = 0.4, maxBucketSize = cap)
      pairs(idx().ingest(b1, "doc_id", "text")) ++ pairs(idx().ingest(b2, "doc_id", "text"))
    }
    assert(run(Some(100L), "capped") == run(None, "uncapped"))
  }
}
