package graft

import graft.ops.Similarity

/** Exact quantized k-means: recovery of planted well-separated blobs, the
  * partition invariants, and determinism across runs (the property the
  * integer arithmetic exists to guarantee).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // Two tight blobs far apart; ids interleaved so init (two lowest ids,
  // one from each blob) seeds both clusters.
  private def blobs = Seq(
    (0L, Seq(0.00f, 0.01f), 0), (1L, Seq(5.00f, 5.01f), 1),
    (2L, Seq(0.02f, -0.01f), 0), (3L, Seq(4.99f, 5.02f), 1),
    (4L, Seq(-0.01f, 0.00f), 0), (5L, Seq(5.01f, 4.98f), 1),
    (6L, Seq(0.01f, 0.02f), 0), (7L, Seq(5.02f, 5.00f), 1)
  ).toDF("vec_id", "embedding", "blob")

  test("two separated blobs, k=2: clusters are exactly the blobs") {
    val out = Similarity.kmeansExact(blobs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.length == 2)
    // blob 0 = ids {0,2,4,6} (sum 12), blob 1 = ids {1,3,5,7} (sum 16);
    // init picks id 0 (blob 0) and id 1 (blob 1), so cluster 0 = blob 0.
    assert(out(0) == (0L, 4L, 12L))
    assert(out(1) == (1L, 4L, 16L))
  }

  test("component magnitudes past the int64-safe bound fail LOUDLY, not silently") {
    // d=64 → quantized bound ≈ sqrt(Long.Max/(4·64)) ≈ 1.9e8 → raw ≈ 190.
    // A vector at 300 must be rejected by the runtime guard.
    val big = Seq((1L, Seq.fill(64)(300.0f)), (2L, Seq.fill(64)(-300.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansExact(big, "vec_id", "embedding", k = 2, iters = 1).count()
    }
    assert(e.getMessage.contains("int64-safe bound"))
  }

  test("real embeddings: final assignment partitions the corpus; determinism across runs") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = Similarity.kmeansExact(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val total = emb.count()
    val idSum = emb.agg(org.apache.spark.sql.functions.sum("vec_id")).head().getLong(0)
    assert(a.map(_._2).sum == total)   // every vector assigned exactly once
    assert(a.map(_._3).sum == idSum)   // membership checksum partitions the ids
    assert(a.length <= 4 && a.nonEmpty)
    val b = Similarity.kmeansExact(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)         // bit-stable under re-execution
  }
}
