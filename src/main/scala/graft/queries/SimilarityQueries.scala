package graft.queries

import graft.ops.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Similarity-search + multimodal corpus over `embeddings` / `documents`.
  * Brute-force cosine top-k is the exact baseline (oracle-checked against
  * DuckDB's list functions); the LSH variant is the 100 TB scale path
  * (approximate → rows-only check).
  */
object SimilarityQueries {
  import Registry.{table => T}

  def all: Seq[Q] = Seq(

    // ---- embedding L2 norms (dot-product plumbing, bit-stable fold)
    Q("emb_norms",
      (s, dir) => T(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.l2Norm(col("embedding")).as("l2_norm")),
      Some("""SELECT vec_id, sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS l2_norm
              |FROM embeddings""".stripMargin)),

    // ---- exact brute-force cosine top-k for a fixed query set
    Q("knn_brute_topk",
      (s, dir) => {
        val corpus = T(s, dir, "embeddings")
        val queries = corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.bruteForceTopK(queries, corpus.filter(col("vec_id") >= 5), k = 10)
          .select(col("q_id"), col("vec_id"), col("rank"), col("sim"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 5),
              | c AS (SELECT vec_id, embedding::DOUBLE[] AS c_vec FROM embeddings WHERE vec_id >= 5),
              | sims AS (SELECT q.q_id, c.vec_id,
              |   CASE WHEN sqrt(list_sum(list_transform(q.q_vec, x -> x*x))) * sqrt(list_sum(list_transform(c.c_vec, x -> x*x))) = 0 THEN 0.0
              |        ELSE list_sum(list_transform(list_zip(q.q_vec, c.c_vec), p -> p[1] * p[2])) /
              |             (sqrt(list_sum(list_transform(q.q_vec, x -> x*x))) * sqrt(list_sum(list_transform(c.c_vec, x -> x*x)))) END AS sim
              |  FROM q CROSS JOIN c),
              | ranked AS (SELECT q_id, vec_id, sim,
              |   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM sims)
              |SELECT q_id, vec_id, rank, sim FROM ranked WHERE rank <= 10""".stripMargin)),

    // ---- LSH-bucketed approximate top-k (scale path; rows-only check)
    Q("knn_lsh_topk",
      (s, dir) => {
        val corpus = T(s, dir, "embeddings")
        val queries = corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.lshTopK(queries, corpus.filter(col("vec_id") >= 5), k = 10,
          nPlanes = 10, tables = 6, dim = 64)
      },
      None),

    // ---- IVF approximate top-k (the other named scale path: coarse
    //      quantizer cells + nProbe probing; rows-only check, recall vs
    //      brute force asserted in OpsSpec)
    Q("knn_ivf_topk",
      (s, dir) => {
        val corpus = T(s, dir, "embeddings")
        val queries = corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfTopK(queries, corpus.filter(col("vec_id") >= 5), k = 10,
          nCells = 16, nProbe = 4)
      },
      None),

    // ---- embedding-cosine near-duplicate pairs, exact baseline (oracle-
    //      checked): all pairs ≥ 0.45 — the synthetic embeddings are near-
    //      orthogonal (max cos ≈ 0.5), so this is the highest threshold with
    //      a non-trivial answer at every SF
    Q("dedup_cosine_exact",
      (s, dir) => Similarity.cosinePairsExact(T(s, dir, "embeddings"), threshold = 0.45),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
              |SELECT * FROM (
              | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  CASE WHEN sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x))) = 0 THEN 0.0
              |       ELSE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
              |            (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x)))) END AS cos
              | FROM e a JOIN e b ON a.vec_id < b.vec_id)
              |WHERE cos >= 0.45""".stripMargin)),

    // ---- same pairs via LSH buckets (the corpus-scale path; approximate →
    //      rows-only check, recall vs the exact baseline asserted in OpsSpec)
    // 4 planes × 24 tables: collision prob per table at cos 0.45 (θ≈63°) is
    // (1-θ/π)^4 ≈ 0.18 → ~99% recall across 24 tables, with 16-bucket tables
    // keeping candidate generation ~n²/16 per table (not the cross product).
    Q("dedup_cosine_pairs",
      (s, dir) => Similarity.cosineNearDups(T(s, dir, "embeddings"),
        threshold = 0.45, nPlanes = 4, tables = 24, dim = 64),
      None),

    // ---- product-quantized top-k (8 subspaces × 16 centroids: 32× less
    //      vector storage; asymmetric ADC scoring against full-precision
    //      queries — FAISS's PQ; compose with IVF cells for IVF-PQ). Clone
    //      recall + noise-recall floor asserted in OpsSpec; rows-only here.
    Q("knn_pq_topk",
      (s, dir) => {
        val corpus = T(s, dir, "embeddings")
        val queries = corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.pqTopK(queries, corpus.filter(col("vec_id") >= 5), k = 10)
      },
      None),

    // ---- SQ8 scalar-quantized top-k (byte-per-dim compression, asymmetric
    //      scoring — the memory/IO rung of the ANN ladder; near-lossless,
    //      recall vs brute force asserted in OpsSpec; rows-only here)
    Q("knn_sq8_topk",
      (s, dir) => {
        val corpus = T(s, dir, "embeddings")
        val queries = corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.sq8TopK(queries, corpus.filter(col("vec_id") >= 5), k = 10)
      },
      None),

    // ---- pairs → connected components → canonical representative: the
    //      cluster/keep step that completes a corpus-dedup pipeline. Spark
    //      side is iterative min-label propagation (one shuffle per round,
    //      rounds = component diameter); oracle is DuckDB's recursive
    //      transitive closure over the same exact pair list.
    Q("dedup_cluster_keep",
      (s, dir) => graft.ops.Cluster.dedupClusters(
          Similarity.cosinePairsExact(T(s, dir, "embeddings"), threshold = 0.45))
        .select(col("id"), col("cluster_id"),
          col("is_keep").cast("long").as("is_keep")),
      Some("""WITH RECURSIVE emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              | e AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
              |  WHERE CASE WHEN sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x))) = 0 THEN 0.0
              |        ELSE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
              |             (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x)))) END >= 0.45),
              | und AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
              | reach(id, r) AS (
              |  SELECT u, u FROM und
              |  UNION
              |  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.id)
              |SELECT id, min(r) AS cluster_id,
              | CAST(id = min(r) AS BIGINT) AS is_keep
              |FROM reach GROUP BY id""".stripMargin)),

    // ---- multimodal ingest: opaque binary payload + typed metadata
    //      (payload here is the document text encoded as bytes; the schema,
    //      metadata derivation, and checksum are the production plumbing)
    Q("media_ingest_meta",
      (s, dir) => {
        val media = T(s, dir, "documents")
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
        Multimodal.withMediaMeta(media, "payload", "image", "fake/raw")
          .select(col("media_id"), col("meta.media_type"), col("meta.format"),
            col("meta.n_bytes"), col("meta.checksum"))
      },
      Some("""SELECT doc_id AS media_id, 'image' AS media_type, 'fake/raw' AS format,
              | octet_length(encode(text))::bigint AS n_bytes, md5(text) AS checksum
              |FROM documents""".stripMargin)),

    // ---- multimodal decode + feature extraction (stubbed codec behind the
    //      real mapPartitions plumbing; deterministic → rows-only check)
    Q("media_image_features",
      (s, dir) => {
        val media = T(s, dir, "documents")
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
        // Surface scalars only: the raw Array[Float] embedding breaks the
        // driver's row compare (arrays are unhashable there); a digest of the
        // rounded components carries the same determinism evidence.
        Multimodal.extractImageFeatures(media, "media_id", "payload", embeddingDim = 8)
          .select(col("media_id"), col("width"), col("height"),
            md5(to_json(transform(col("embedding"), e => round(e.cast("double"), 4))))
              .as("embedding_md5"))
      },
      None),

    // ---- multimodal frame sampling (deterministic byte slices — oracle-able)
    Q("media_frame_sample",
      (s, dir) => {
        val media = T(s, dir, "documents")
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
        Multimodal.sampleFrames(media, "media_id", "payload", n = 4)
          .select(col("media_id"), col("frame_no"),
            md5(col("frame_bytes")).as("frame_md5"))
      },
      // NB text is ASCII in this corpus, so varchar substring ≡ byte slicing
      // (DuckDB 1.0 has no BLOB substring).
      Some("""SELECT doc_id AS media_id, i AS frame_no,
              | md5(substring(text, cast(i * (length(text) // 4) + 1 as bigint),
              |     cast(greatest(1, length(text) // 4) as bigint))) AS frame_md5
              |FROM documents, unnest([0,1,2,3]) AS t(i)""".stripMargin))
  )
}
