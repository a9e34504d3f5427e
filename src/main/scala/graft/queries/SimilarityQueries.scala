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

  /** Recall-gate harness for the approximate top-k variants (the
    * bounds-gating pattern of the hll/percentile oracles): plant a
    * deterministic perturbed clone of every query vector in the corpus (the
    * #1 exact neighbor — the guarantee ANN must keep), run the approximate
    * search AND the exact brute-force baseline, and emit one summary row —
    * (n_queries, clones_found, recall_ok) — whose values the oracle pins.
    * A recall collapse or a lost clone now hash-FAILS instead of sliding
    * through a rows-only check. The embeddings are near-orthogonal noise,
    * so floors are variant-appropriate: sign-LSH/PQ only promise the
    * near-dup guarantee (clones), IVF/SQ8 also promise a brute-force
    * overlap floor.
    */
  private def recallGated(s: org.apache.spark.sql.SparkSession, dir: String,
                          minTotalHits: Long,
                          run: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
                            => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val clones = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * lit(1.01f)).otherwise(x)).as("embedding"))
    val corpus = emb.filter(col("vec_id") >= 5).unionByName(clones)
    val approx = run(queries, corpus).select(col("q_id"), col("vec_id"))
    recallGate(queries, corpus, approx, minTotalHits)
  }

  /** The gate tail of [[recallGated]], shared with queries that stage their
    * corpus differently (the persisted index builds from base and APPENDS
    * the clones): exact baseline over the full corpus, per-query overlap +
    * clone hits, one pinned summary row.
    */
  private def recallGate(queries: org.apache.spark.sql.DataFrame,
                         corpus: org.apache.spark.sql.DataFrame,
                         approx: org.apache.spark.sql.DataFrame,
                         minTotalHits: Long): org.apache.spark.sql.DataFrame = {
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select(col("q_id"), col("vec_id"))
    val hits = approx.join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    val cloneHit = approx.filter(col("vec_id") === col("q_id") + 10000000L)
      .select(col("q_id")).distinct().withColumn("c", lit(1L))
    queries.select(col("q_id"))
      .join(hits, Seq("q_id"), "left")
      .join(cloneHit, Seq("q_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(coalesce(col("c"), lit(0L))).as("clones_found"),
        (sum(coalesce(col("hits"), lit(0L))) >= minTotalHits).as("recall_ok"))
  }

  private val recallOracle =
    "SELECT 5::BIGINT AS n_queries, 5::BIGINT AS clones_found, true AS recall_ok"

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

    // ---- LSH-bucketed approximate top-k (scale path), recall-gated: the
    //      planted-clone guarantee plus a hits floor, hash-checked
    Q("knn_lsh_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 5, (q, c) =>
        Similarity.lshTopK(q, c, k = 10, nPlanes = 10, tables = 6, dim = 64)),
      Some(recallOracle)),

    // ---- IVF approximate top-k (the other named scale path: coarse
    //      quantizer cells + nProbe probing), recall-gated vs brute force
    //      (floor 0.4 — OpsSpec asserts 0.5 on a fixed fixture; the gate
    //      leaves margin for SF-dependent cell layouts)
    Q("knn_ivf_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 20, (q, c) =>
        Similarity.ivfTopK(q, c, k = 10, nCells = 16, nProbe = 4)),
      Some(recallOracle)),

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

    // ---- same pairs via LSH buckets (the corpus-scale path), now
    //      precision/recall-gated against the exact baseline instead of a
    //      rows-only check: precision_ok is structural (candidates are
    //      verified by the same exact cosine, so found ⊆ exact), recall_ok
    //      floors found/exact at 0.8.
    // 4 planes × 24 tables: collision prob per table at cos 0.45 (θ≈63°) is
    // (1-θ/π)^4 ≈ 0.18 → ~99% recall across 24 tables, with 16-bucket tables
    // keeping candidate generation ~n²/16 per table (not the cross product);
    // measured recall 1.0 at sf0.001/0.01/0.1.
    Q("dedup_cosine_pairs",
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val found = Similarity.cosineNearDups(emb,
          threshold = 0.45, nPlanes = 4, tables = 24, dim = 64)
          .select("id_a", "id_b")
        val exact = Similarity.cosinePairsExact(emb, threshold = 0.45)
          .select("id_a", "id_b")
        val tp = found.join(exact, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("tp"))
        val fp = found.join(exact, Seq("id_a", "id_b"), "left_anti")
          .agg(count(lit(1)).as("fp"))
        exact.agg(count(lit(1)).as("n_exact")).crossJoin(tp).crossJoin(fp)
          .select(col("n_exact"),
            (col("fp") === 0).as("precision_ok"),
            (col("tp").cast("double") >=
              col("n_exact").cast("double") * 0.8).as("recall_ok"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
              |SELECT count(*)::bigint AS n_exact, true AS precision_ok, true AS recall_ok
              |FROM (
              | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  CASE WHEN sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x))) = 0 THEN 0.0
              |       ELSE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) /
              |            (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x)))) END AS cos
              | FROM e a JOIN e b ON a.vec_id < b.vec_id)
              |WHERE cos >= 0.45""".stripMargin)),

    // ---- product-quantized top-k (8 subspaces × 16 centroids: 32× less
    //      vector storage; asymmetric ADC scoring against full-precision
    //      queries — FAISS's PQ; compose with IVF cells for IVF-PQ).
    //      Recall-gated on the planted-clone guarantee (PQ scrambles weak
    //      noise orderings by design — OpsSpec documents ~0.3 noise recall)
    Q("knn_pq_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 5, (q, c) =>
        Similarity.pqTopK(q, c, k = 10)),
      Some(recallOracle)),

    // ---- IVF-PQ composed top-k (the classic billion-scale layout: cells
    //      bound the candidates, codes bound storage/scoring). Clone-gated
    //      like PQ: the planted near-identical clone lands in the query's
    //      probed cells and must survive PQ ranking.
    Q("knn_ivfpq_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 5, (q, c) =>
        Similarity.ivfPqTopK(q, c, k = 10)),
      Some(recallOracle)),

    // ---- residual IVF-PQ (the FAISS refinement: codes quantize the offset
    //      from the cell centroid, spending the fixed code budget on the
    //      within-cell variance). Same recall gate; OpsSpec additionally
    //      asserts residual recall >= raw IVF-PQ recall on a fixed fixture.
    Q("knn_ivfpq_residual_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 5, (q, c) =>
        Similarity.ivfPqResidualTopK(q, c, k = 10)),
      Some(recallOracle)),

    // ---- SQ8 scalar-quantized top-k (byte-per-dim compression, asymmetric
    //      scoring — the memory/IO rung of the ANN ladder), recall-gated at
    //      a 0.7 floor (near-lossless; OpsSpec asserts 0.8 on its fixture)
    Q("knn_sq8_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 35, (q, c) =>
        Similarity.sq8TopK(q, c, k = 10)),
      Some(recallOracle)),

    // ---- binary-quantized top-k (1 bit/dim: 64 dims → ONE int64, 32× below
    //      float32 — the rung below SQ8). Exhaustive bit_count(xor) Hamming
    //      scan over packed words generates candidates; exact cosine reranks
    //      the top-`rerank`. Clone-gated (a near-identical clone keeps an
    //      ~identical sign pattern → Hamming ≈ 0) with a brute-force overlap
    //      floor; OpsSpec asserts 0.5 recall on its fixed fixture.
    Q("knn_bq_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 20, (q, c) =>
        Similarity.bqTopK(q, c, k = 10, rerank = 64)),
      Some(recallOracle)),

    // ---- IVF + BQ composed top-k: cells bound candidate COUNT, sign bits
    //      bound candidate BYTES (~16 B/vector through the Hamming phase),
    //      exact rerank on the survivors — the layout for corpora where
    //      even byte codes are too much to stream. Clone-gated with a
    //      brute-force overlap floor like its parts.
    Q("knn_ivfbq_topk",
      (s, dir) => recallGated(s, dir, minTotalHits = 15, (q, c) =>
        Similarity.ivfBqTopK(q, c, k = 10)),
      Some(recallOracle)),

    // ---- persisted IVF index LIFECYCLE: TRAIN+BUILD from the base corpus
    //      (centroids + vectors hive-partitioned by cell on disk), APPEND
    //      each clone as its own batch against the saved centroids (no
    //      re-cluster — the O(new) ingest path, accreting real small-file
    //      debt), COMPACT the debt away preserving the cell partitioning,
    //      then SEARCH the saved index. Same recall gate as the in-query
    //      IVF plus a compaction-fired boolean; the search scan is
    //      partition-pruned to the probed cells (VectorIndexSpec pins
    //      PartitionFilters), which is the property that makes query IO
    //      nProbe/nCells of the corpus at any scale.
    Q("knn_ivf_persisted",
      (s, dir) => {
        val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val clones = emb.filter(col("vec_id") < 5)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x * lit(1.01f)).otherwise(x)).as("embedding"))
        val base = emb.filter(col("vec_id") >= 5)
        val idx = java.nio.file.Files.createTempDirectory("graft_vecindex").toString
        graft.ops.VectorIndex.build(base, idx, nCells = 16)
        graft.ops.VectorIndex.append(
          clones.filter(col("vec_id") < 10000002L), idx)
        graft.ops.VectorIndex.append(
          clones.filter(col("vec_id") >= 10000002L), idx)
        val vp = new org.apache.hadoop.fs.Path(s"$idx/vectors")
        val fs = vp.getFileSystem(s.sessionState.newHadoopConf())
        val debt = graft.ops.FsMaint.dataFileCount(fs, vp)
        val after = graft.ops.VectorIndex.compact(s, idx, targetBytes = 64L << 20)
        val approx = graft.ops.VectorIndex.search(queries, idx, k = 10, nProbe = 4)
          .select(col("q_id"), col("vec_id"))
        recallGate(queries, base.unionByName(clones), approx, minTotalHits = 20)
          .withColumn("compacted", lit(after < debt))
      },
      Some("""SELECT 5::BIGINT AS n_queries, 5::BIGINT AS clones_found,
              | true AS recall_ok, true AS compacted""".stripMargin)),

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

    // ---- multimodal decode + feature extraction with the REAL PPM decoder:
    //      every document becomes a valid P6 payload (header + w*h*3 raw
    //      bytes taken from its text, 'x'-padded), the decoder parses the
    //      header and computes per-channel pixel statistics, and the oracle
    //      replays the identical byte math in SQL — decoded values are
    //      hash-checked, not just deterministic. (Text is ASCII in this
    //      corpus, so char positions ≡ byte positions on both sides.)
    Q("media_image_features",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val wE = (col("doc_id") % 5 + 4).cast("int") // 4..8 px wide
        val hE = (col("doc_id") % 4 + 3).cast("int") // 3..6 px tall
        val nE = wE * hE * lit(3)
        val body = concat(col("text"), lit("x" * 144)).substr(lit(1), nE)
        val payload = concat(lit("P6\n"), wE.cast("string"), lit(" "),
          hE.cast("string"), lit("\n255\n"), body).cast("binary")
        val media = d.select(col("doc_id").as("media_id"), payload.as("payload"))
        Multimodal.extractImageFeatures(media, "media_id", "payload", embeddingDim = 8)
          .select(col("media_id"), col("width"), col("height"),
            element_at(col("embedding"), 1).cast("long").as("r_sum"),
            element_at(col("embedding"), 2).cast("long").as("g_sum"),
            element_at(col("embedding"), 3).cast("long").as("b_sum"),
            element_at(col("embedding"), 4).cast("long").as("min_v"),
            element_at(col("embedding"), 5).cast("long").as("max_v"),
            element_at(col("embedding"), 6).cast("long").as("n_px"),
            element_at(col("embedding"), 7).cast("long").as("first_v"),
            element_at(col("embedding"), 8).cast("long").as("last_v"))
      },
      Some("""WITH g AS (SELECT doc_id AS media_id,
              |   (doc_id % 5 + 4)::int AS width, (doc_id % 4 + 3)::int AS height,
              |   ((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3)::int AS n, text
              |  FROM documents),
              | p AS (SELECT media_id, width, height, n,
              |   substring(text || repeat('x', 144), 1, n) AS px FROM g),
              | b AS (SELECT media_id, width, height, n,
              |   list_transform(range(1, n + 1), i -> ord(substring(px, i, 1))) AS vs FROM p)
              |SELECT media_id, width, height,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[1 + j * 3])) as bigint) AS r_sum,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[2 + j * 3])) as bigint) AS g_sum,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[3 + j * 3])) as bigint) AS b_sum,
              | cast(list_min(vs) as bigint) AS min_v,
              | cast(list_max(vs) as bigint) AS max_v,
              | (n // 3)::bigint AS n_px,
              | vs[1]::bigint AS first_v,
              | vs[n]::bigint AS last_v
              |FROM b""".stripMargin)),

    // ---- quarantine stream: every 10th payload corrupted (magic bytes
    //      flipped) — undecodable by construction. The WithRejects decode
    //      keeps EVERY row (decode_ok = false + NULL features for rejects);
    //      the oracle pins the reject count AND the rejected-id checksum,
    //      so a silent drop (or a decoder that "fixes" garbage) hash-fails.
    Q("media_quarantine",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val wE = (col("doc_id") % 5 + 4).cast("int")
        val hE = (col("doc_id") % 4 + 3).cast("int")
        val nE = wE * hE * lit(3)
        val body = concat(col("text"), lit("x" * 144)).substr(lit(1), nE)
        val magic = when(col("doc_id") % 10 === 0, lit("ZZ\n")).otherwise(lit("P6\n"))
        val payload = concat(magic, wE.cast("string"), lit(" "),
          hE.cast("string"), lit("\n255\n"), body).cast("binary")
        val media = d.select(col("doc_id").as("media_id"), payload.as("payload"))
        Multimodal.extractImageFeaturesWithRejects(media, "media_id", "payload",
            embeddingDim = 8)
          .agg(
            count(when(col("decode_ok"), lit(1))).as("n_ok"),
            count(when(!col("decode_ok"), lit(1))).as("n_rejects"),
            coalesce(sum(when(!col("decode_ok"), col("media_id"))), lit(0L))
              .as("reject_id_sum"))
      },
      Some("""SELECT count(CASE WHEN doc_id % 10 <> 0 THEN 1 END)::bigint AS n_ok,
              | count(CASE WHEN doc_id % 10 = 0 THEN 1 END)::bigint AS n_rejects,
              | coalesce(sum(CASE WHEN doc_id % 10 = 0 THEN doc_id END), 0)::bigint AS reject_id_sum
              |FROM documents""".stripMargin)),

    // ---- compressed-format decode (javax.imageio, JDK readers — no
    //      external codecs): the SAME deterministic pixels as
    //      media_image_features are ENCODED to real PNG payloads, decoded
    //      through ImageIoDecoder, and the per-channel statistics must
    //      replay the identical byte math in the oracle — PNG is lossless,
    //      so compressed-path decode is held to the exact same hash gate as
    //      the uncompressed path.
    Q("media_png_features",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val wE = (col("doc_id") % 5 + 4).cast("int")
        val hE = (col("doc_id") % 4 + 3).cast("int")
        val nE = wE * hE * lit(3)
        val body = concat(col("text"), lit("x" * 144)).substr(lit(1), nE)
        val base = d.select(col("doc_id").cast("long").as("media_id"),
          wE.as("w"), hE.as("h"), body.cast("binary").as("px"))
        // Fixture encode (not the measured operator): deterministic RGB
        // pixels → real PNG bytes, per partition.
        val enc = org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("media_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.BinaryType, nullable = false))))
        val media = base.mapPartitions { it =>
          it.map { r =>
            val w = r.getInt(1); val h = r.getInt(2)
            val px = r.getAs[Array[Byte]](3)
            val im = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var i = 0; var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                im.setRGB(x, y, ((px(i) & 0xFF) << 16) |
                  ((px(i + 1) & 0xFF) << 8) | (px(i + 2) & 0xFF))
                i += 3; x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(im, "png", bos)
            org.apache.spark.sql.Row(r.getLong(0), bos.toByteArray)
          }
        }(enc).toDF()
        Multimodal.extractImageFeatures(media, "media_id", "payload",
            embeddingDim = 8, decoder = Multimodal.ImageIoDecoder)
          .select(col("media_id"), col("width"), col("height"),
            element_at(col("embedding"), 1).cast("long").as("r_sum"),
            element_at(col("embedding"), 2).cast("long").as("g_sum"),
            element_at(col("embedding"), 3).cast("long").as("b_sum"),
            element_at(col("embedding"), 4).cast("long").as("min_v"),
            element_at(col("embedding"), 5).cast("long").as("max_v"),
            element_at(col("embedding"), 6).cast("long").as("n_px"),
            element_at(col("embedding"), 7).cast("long").as("first_v"),
            element_at(col("embedding"), 8).cast("long").as("last_v"))
      },
      Some("""WITH g AS (SELECT doc_id AS media_id,
              |   (doc_id % 5 + 4)::int AS width, (doc_id % 4 + 3)::int AS height,
              |   ((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3)::int AS n, text
              |  FROM documents),
              | p AS (SELECT media_id, width, height, n,
              |   substring(text || repeat('x', 144), 1, n) AS px FROM g),
              | b AS (SELECT media_id, width, height, n,
              |   list_transform(range(1, n + 1), i -> ord(substring(px, i, 1))) AS vs FROM p)
              |SELECT media_id, width, height,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[1 + j * 3])) as bigint) AS r_sum,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[2 + j * 3])) as bigint) AS g_sum,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[3 + j * 3])) as bigint) AS b_sum,
              | cast(list_min(vs) as bigint) AS min_v,
              | cast(list_max(vs) as bigint) AS max_v,
              | (n // 3)::bigint AS n_px,
              | vs[1]::bigint AS first_v,
              | vs[n]::bigint AS last_v
              |FROM b""".stripMargin)),

    // ---- REAL nearest-neighbor resize: deterministic PPM payloads →
    //      resizeImages(2×2) → PNG → ImageIoDecoder stats. The resize's
    //      pixel selection is pinned arithmetic (src = (x·w div 2,
    //      y·h div 2)), so the oracle picks the SAME 4 source pixels out of
    //      the text bytes in SQL and the decoded stats must hash-match —
    //      decode, resample, re-encode, decode again, all byte-exact.
    Q("media_resize",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val wE = (col("doc_id") % 5 + 4).cast("int")
        val hE = (col("doc_id") % 4 + 3).cast("int")
        val nE = wE * hE * lit(3)
        val body = concat(col("text"), lit("x" * 144)).substr(lit(1), nE)
        val payload = concat(lit("P6\n"), wE.cast("string"), lit(" "),
          hE.cast("string"), lit("\n255\n"), body).cast("binary")
        val media = d.select(col("doc_id").as("media_id"), payload.as("payload"))
        val resized = Multimodal.resizeImages(media, "media_id", "payload",
          outW = 2, outH = 2)
        Multimodal.extractImageFeatures(resized.filter(col("decode_ok")),
            "media_id", "payload", embeddingDim = 8,
            decoder = Multimodal.ImageIoDecoder)
          .select(col("media_id"), col("width"), col("height"),
            element_at(col("embedding"), 1).cast("long").as("r_sum"),
            element_at(col("embedding"), 2).cast("long").as("g_sum"),
            element_at(col("embedding"), 3).cast("long").as("b_sum"),
            element_at(col("embedding"), 4).cast("long").as("min_v"),
            element_at(col("embedding"), 5).cast("long").as("max_v"),
            element_at(col("embedding"), 6).cast("long").as("n_px"),
            element_at(col("embedding"), 7).cast("long").as("first_v"),
            element_at(col("embedding"), 8).cast("long").as("last_v"))
      },
      Some("""WITH g AS (SELECT doc_id AS media_id,
              |   (doc_id % 5 + 4)::int AS w, (doc_id % 4 + 3)::int AS h,
              |   ((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3)::int AS n, text
              |  FROM documents),
              | p AS (SELECT media_id, w, h,
              |   substring(text || repeat('x', 144), 1, n) AS px FROM g),
              | q AS (SELECT media_id,
              |   flatten(list_transform([0, 1], y ->
              |     flatten(list_transform([0, 1], x ->
              |       list_transform([1, 2, 3], c ->
              |         ord(substring(px, ((y * h // 2) * w + (x * w // 2)) * 3 + c, 1))))))) AS pk
              |  FROM p)
              |SELECT media_id, 2::int AS width, 2::int AS height,
              | (pk[1] + pk[4] + pk[7] + pk[10])::bigint AS r_sum,
              | (pk[2] + pk[5] + pk[8] + pk[11])::bigint AS g_sum,
              | (pk[3] + pk[6] + pk[9] + pk[12])::bigint AS b_sum,
              | cast(list_min(pk) as bigint) AS min_v,
              | cast(list_max(pk) as bigint) AS max_v,
              | 4::bigint AS n_px,
              | pk[1]::bigint AS first_v, pk[12]::bigint AS last_v
              |FROM q""".stripMargin)),

    // ---- perceptual image near-dup: dHash (64-bit difference hash over a
    //      9×8 average-pooled grayscale grid, exact integer math) + the
    //      SimHash-style Hamming-piece bucketing — the raw-media analog of
    //      text near-dup. Fixture: doc-seeded pseudo-random 18×16 PPM
    //      images; every planted clone is a REAL 2× nearest-neighbor
    //      resize + PNG re-encode of its original (different bytes, dims,
    //      and container — same perceptual content). Gate: every
    //      original↔clone pair surfaces at Hamming 0 (18 | 9·2 and 16 | 8·2,
    //      so the upscale pools identical pixel multisets); unrelated
    //      images (~32 differing bits) must produce ZERO pairs.
    Q("media_phash_neardup",
      (s, dir) => {
        val enc = org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("media_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.BinaryType, nullable = false))))
        val base = T(s, dir, "documents").filter(col("doc_id") % 5 === 2)
          .select(col("doc_id").cast("long").as("media_id"))
        // Fixture encode (not the measured operator): java.util.Random is
        // seed-deterministic by spec, so payloads are reproducible anywhere.
        val originals = base.mapPartitions { it =>
          val header = "P6\n18 16\n255\n".getBytes("US-ASCII")
          it.map { r =>
            val id = r.getLong(0)
            val rnd = new java.util.Random(id)
            val px = new Array[Byte](18 * 16 * 3)
            rnd.nextBytes(px)
            val payload = new Array[Byte](header.length + px.length)
            header.copyToArray(payload, 0)
            px.copyToArray(payload, header.length)
            org.apache.spark.sql.Row(id, payload)
          }
        }(enc).toDF()
        val clones = Multimodal.resizeImages(originals, "media_id", "payload",
            outW = 36, outH = 32)
          .filter(col("decode_ok"))
          .select((col("media_id") + 1000000L).as("media_id"), col("payload"))
        val hashes = Multimodal.dHashImages(originals.unionByName(clones),
          "media_id", "payload")
        val pairs = graft.ops.Dedup.hammingNearDups64(
          hashes.filter(col("decode_ok")), "media_id", "dhash", maxHamming = 3)
        val cloneHits = pairs
          .filter(col("id_b") === col("id_a") + 1000000L && col("hamming") === 0)
          .select("id_a").distinct()
          .agg(count(lit(1)).as("clones_found"))
        val falsePairs = pairs.filter(col("id_b") =!= col("id_a") + 1000000L)
          .agg(count(lit(1)).as("n_false"))
        base.agg(count(lit(1)).as("n_planted"),
            (max(col("media_id")) < 1000000L).as("id_space_ok"))
          .crossJoin(cloneHits).crossJoin(falsePairs)
          .select(col("n_planted"), col("clones_found"),
            (col("clones_found") === col("n_planted")).as("all_found"),
            (col("n_false") === 0).as("precision_ok"),
            col("id_space_ok"))
      },
      Some("""SELECT count(*)::bigint AS n_planted, count(*)::bigint AS clones_found,
              | true AS all_found, true AS precision_ok, true AS id_space_ok
              |FROM documents WHERE doc_id % 5 = 2""".stripMargin)),

    // ---- perceptual VIDEO near-dup, completing the modality triple: a
    //      clip's signature is the dHash of each pinned-arithmetic sampled
    //      frame. TWO match rules, both equality joins (no banding, bucket
    //      cardinality ∝ corpus): (a) position-aligned — every (sample
    //      position, hash) agrees, the re-encode/upscale case; (b)
    //      position-FREE — ≥3 of 4 distinct sampled hashes shared, which
    //      survives a TRIMMED clip (dropping frames shifts every sample
    //      position, so rule (a) must miss it and rule (b) must catch it —
    //      both directions are gated). Planted clones: per-frame EXACT 2×
    //      upscales in a fresh container, and a first-frame trim; unrelated
    //      clips share no frame hashes.
    Q("media_video_neardup",
      (s, dir) => {
        val enc = org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("media_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.BinaryType, nullable = false))))
        val base = T(s, dir, "documents").filter(col("doc_id") % 9 === 4)
          .select(col("doc_id").cast("long").as("media_id"))
        val videos = base.mapPartitions { it =>
          def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
            s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
          def up2x(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
            val out = new Array[Byte](4 * px.length)
            var y = 0
            while (y < 2 * h) {
              var x = 0
              while (x < 2 * w) {
                val si = ((y / 2) * w + (x / 2)) * 3
                val di = (y * 2 * w + x) * 3
                out(di) = px(si); out(di + 1) = px(si + 1); out(di + 2) = px(si + 2)
                x += 1
              }
              y += 1
            }
            out
          }
          it.flatMap { r =>
            val id = r.getLong(0)
            val frames = (0 until 6).map { f =>
              val rnd = new java.util.Random(id * 131 + f)
              val px = new Array[Byte](18 * 16 * 3)
              rnd.nextBytes(px)
              px
            }
            val orig = frames.map(ppm(18, 16, _)).reduce(_ ++ _)
            val clone = frames.map(px => ppm(36, 32, up2x(px, 18, 16))).reduce(_ ++ _)
            val trimmed = frames.drop(1).map(ppm(18, 16, _)).reduce(_ ++ _)
            Iterator(
              org.apache.spark.sql.Row(id, orig),
              org.apache.spark.sql.Row(id + 1000000L, clone),
              org.apache.spark.sql.Row(id + 2000000L, trimmed))
          }
        }(enc).toDF()
        val sig = Multimodal.videoFrameHashes(videos, "media_id", "payload", n = 4)
          .filter(col("decode_ok"))
          .localCheckpoint(true) // reused by BOTH match rules below
        try {
          // Rule (a): position-aligned — all 4 (position, hash) rows agree.
          val posPairs = sig.as("a").join(sig.as("b"),
              col("a.frame_no") === col("b.frame_no") &&
              col("a.dhash") === col("b.dhash") &&
              col("a.media_id") < col("b.media_id"))
            .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
            .agg(count(lit(1)).as("matched"))
            .filter(col("matched") === 4)
          // Rule (b): position-free — ≥3 distinct sampled hashes shared
          // (a trim shifts every sample position; the hash SET survives).
          val hs = sig.select(col("media_id"), col("dhash")).distinct()
          val setPairs = hs.as("a").join(hs.as("b"),
              col("a.dhash") === col("b.dhash") &&
              col("a.media_id") < col("b.media_id"))
            .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
            .agg(count(lit(1)).as("shared"))
            .filter(col("shared") >= 3)
          // Position rule: exactly the orig↔upscale pair per doc (the trim
          // aligns on only 2 of 4 positions and MUST be missed — the gap
          // rule (b) exists to close).
          val posClones = posPairs.filter(col("id_b") === col("id_a") + 1000000L)
            .agg(count(lit(1)).as("pos_clones"))
          val posFalse = posPairs.filter(col("id_b") =!= col("id_a") + 1000000L)
            .agg(count(lit(1)).as("pos_false"))
          // Set rule: all 3 same-doc pairs per doc (orig↔upscale,
          // orig↔trim, upscale↔trim), nothing across docs.
          val setFamily = setPairs
            .filter(col("id_a") % 1000000L === col("id_b") % 1000000L)
            .agg(count(lit(1)).as("set_family"))
          val setFalse = setPairs
            .filter(col("id_a") % 1000000L =!= col("id_b") % 1000000L)
            .agg(count(lit(1)).as("set_false"))
          base.agg(count(lit(1)).as("n_planted"),
              (max(col("media_id")) < 1000000L).as("id_space_ok"))
            .crossJoin(posClones).crossJoin(posFalse)
            .crossJoin(setFamily).crossJoin(setFalse)
            .select(col("n_planted"),
              (col("pos_clones") === col("n_planted")).as("pos_all_found"),
              (col("pos_false") === 0).as("pos_precision_ok"),
              (col("set_family") === col("n_planted") * 3).as("set_trim_found"),
              (col("set_false") === 0).as("set_precision_ok"),
              col("id_space_ok"))
            .localCheckpoint(true)
        } finally graft.ops.Caching.release(sig)
      },
      Some("""SELECT count(*)::bigint AS n_planted, true AS pos_all_found,
              | true AS pos_precision_ok, true AS set_trim_found,
              | true AS set_precision_ok, true AS id_space_ok
              |FROM documents WHERE doc_id % 9 = 4""".stripMargin)),

    // ---- perceptual AUDIO near-dup: the envelope-difference hash (64
    //      energy-gradient bits over 65 windows of |amplitude| sums, exact
    //      cross-multiplied integers) + the same Hamming-piece bucketing as
    //      the image path. Planted clones exercise BOTH declared
    //      invariances: a container REPACK (a junk LIST chunk spliced
    //      before `data` — the chunk walk must reach the same samples) and
    //      an EXACT half-volume copy (fixture samples are even, so v/2 is
    //      exact and every window sum scales uniformly — all comparisons
    //      preserved). Gate: all 3 same-doc pairs per planted doc at
    //      Hamming 0; unrelated audio (~32 differing bits) → zero pairs.
    Q("media_audio_neardup",
      (s, dir) => {
        val enc = org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("media_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.BinaryType, nullable = false))))
        val base = T(s, dir, "documents").filter(col("doc_id") % 7 === 3)
          .select(col("doc_id").cast("long").as("media_id"))
        val variants = base.mapPartitions { it =>
          it.flatMap { r =>
            val id = r.getLong(0)
            val rnd = new java.util.Random(id)
            // 130 EVEN samples in [-16384, 16382]: evenness makes the
            // half-volume clone exact; the range keeps |v| well inside int16.
            val pcm = new Array[Byte](130 * 2)
            val half = new Array[Byte](130 * 2)
            var i = 0
            while (i < 130) {
              val v = (rnd.nextInt(32768) - 16384) & ~1
              pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
              val h = v / 2
              half(2 * i) = (h & 0xFF).toByte; half(2 * i + 1) = ((h >> 8) & 0xFF).toByte
              i += 1
            }
            val orig = Multimodal.encodeWavPcm16(pcm, 8000, 1)
            // Container repack: splice a junk LIST chunk between fmt and
            // data (same PCM payload, different bytes/offsets).
            val junk = "LIST".getBytes("US-ASCII") ++
              Array[Byte](4, 0, 0, 0) ++ "junk".getBytes("US-ASCII")
            val repacked = orig.slice(0, 36) ++ junk ++ orig.slice(36, orig.length)
            // RIFF size field covers everything after offset 8.
            val riffLen = repacked.length - 8
            repacked(4) = (riffLen & 0xFF).toByte
            repacked(5) = ((riffLen >> 8) & 0xFF).toByte
            repacked(6) = ((riffLen >> 16) & 0xFF).toByte
            repacked(7) = ((riffLen >> 24) & 0xFF).toByte
            Iterator(
              org.apache.spark.sql.Row(id, orig),
              org.apache.spark.sql.Row(id + 1000000L, repacked),
              org.apache.spark.sql.Row(id + 2000000L,
                Multimodal.encodeWavPcm16(half, 8000, 1)))
          }
        }(enc).toDF()
        val hashes = Multimodal.audioEnvelopeHash(variants, "media_id", "payload")
        val pairs = graft.ops.Dedup.hammingNearDups64(
          hashes.filter(col("decode_ok")), "media_id", "ahash", maxHamming = 3)
        // Same-doc pairs (orig/repack/half share doc_id mod 1e6) vs false.
        val family = pairs.filter(col("id_a") % 1000000L === col("id_b") % 1000000L)
        val familyHits = family.filter(col("hamming") === 0)
          .agg(count(lit(1)).as("family_pairs"))
        val falsePairs = pairs.filter(col("id_a") % 1000000L =!= col("id_b") % 1000000L)
          .agg(count(lit(1)).as("n_false"))
        base.agg(count(lit(1)).as("n_planted"),
            (max(col("media_id")) < 1000000L).as("id_space_ok"))
          .crossJoin(familyHits).crossJoin(falsePairs)
          .select(col("n_planted"), col("family_pairs"),
            (col("family_pairs") === col("n_planted") * 3).as("all_found"),
            (col("n_false") === 0).as("precision_ok"),
            col("id_space_ok"))
      },
      Some("""SELECT count(*)::bigint AS n_planted, (count(*) * 3)::bigint AS family_pairs,
              | true AS all_found, true AS precision_ok, true AS id_space_ok
              |FROM documents WHERE doc_id % 7 = 3""".stripMargin)),

    // ---- REAL audio decode: deterministic PCM16 samples (from text bytes)
    //      wrapped in a genuine RIFF/WAVE container, chunk-walked and
    //      sample-decoded by WavPcmDecoder; the oracle rebuilds the int16
    //      little-endian decode in SQL, so header parse + sample math are
    //      both hash-gated. (ASCII text ⇒ high bytes < 128 ⇒ all samples
    //      positive here; sign handling is spec'd in MultimodalSpec.)
    Q("media_audio_features",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val pcm = concat(col("text"), lit("x" * 80)).substr(lit(1), lit(80))
        val base = d.select(col("doc_id").cast("long").as("media_id"),
          pcm.cast("binary").as("pcm"))
        val enc = org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("media_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.BinaryType, nullable = false))))
        val media = base.mapPartitions { it =>
          it.map { r =>
            org.apache.spark.sql.Row(r.getLong(0), Multimodal.encodeWavPcm16(
              r.getAs[Array[Byte]](1), sampleRate = 8000, channels = 1))
          }
        }(enc).toDF()
        Multimodal.extractAudioFeatures(media, "media_id", "payload")
      },
      Some("""WITH p AS (SELECT doc_id AS media_id,
              |   substring(text || repeat('x', 80), 1, 80) AS px FROM documents),
              | b AS (SELECT media_id,
              |   list_transform(range(1, 81), i -> ord(substring(px, i, 1))) AS vs FROM p),
              | sm AS (SELECT media_id,
              |   list_transform(range(0, 40), j -> vs[2*j+1] + 256 * vs[2*j+2]) AS sa FROM b)
              |SELECT media_id, true AS decode_ok, 8000::int AS sample_rate,
              | 1::int AS n_channels, 40::bigint AS n_samples,
              | cast(list_sum(sa) as bigint) AS sum_amp,
              | cast(list_min(sa) as int) AS min_amp,
              | cast(list_max(sa) as int) AS max_amp,
              | cast(sa[1] as int) AS first_amp,
              | cast(sa[40] as int) AS last_amp
              |FROM sm""".stripMargin)),

    // ---- REAL video-frame decode: MJPEG-style container (self-delimiting
    //      frames stored back to back — here P6 PPM, whose header declares
    //      the frame's byte length), split + sampled with pinned arithmetic
    //      (frame i ← i·nFrames div n) + per-frame pixel decode. Three
    //      frames per doc from distinct text slices; n=2 sampling must pick
    //      frames {0, 1} and their decoded stats must replay the oracle's
    //      per-frame byte math exactly.
    Q("media_video_frames",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val wE = (col("doc_id") % 5 + 4).cast("int")
        val hE = (col("doc_id") % 4 + 3).cast("int")
        val nE = wE * hE * lit(3)
        val padded = concat(col("text"), lit("x" * 432))
        def frame(k: Int) = concat(lit("P6\n"), wE.cast("string"), lit(" "),
          hE.cast("string"), lit("\n255\n"), padded.substr(nE * lit(k) + 1, nE))
        val payload = concat(frame(0), frame(1), frame(2)).cast("binary")
        val media = d.select(col("doc_id").as("media_id"), payload.as("payload"))
        Multimodal.sampleFramesDecoded(media, "media_id", "payload", n = 2)
          .select(col("media_id"), col("frame_no"), col("width"), col("height"),
            element_at(col("embedding"), 1).cast("long").as("r_sum"),
            element_at(col("embedding"), 2).cast("long").as("g_sum"),
            element_at(col("embedding"), 3).cast("long").as("b_sum"),
            element_at(col("embedding"), 4).cast("long").as("min_v"),
            element_at(col("embedding"), 5).cast("long").as("max_v"),
            element_at(col("embedding"), 6).cast("long").as("n_px"),
            element_at(col("embedding"), 7).cast("long").as("first_v"),
            element_at(col("embedding"), 8).cast("long").as("last_v"))
      },
      Some("""WITH g AS (SELECT doc_id AS media_id,
              |   (doc_id % 5 + 4)::int AS width, (doc_id % 4 + 3)::int AS height,
              |   ((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3)::int AS n,
              |   text || repeat('x', 432) AS tx
              |  FROM documents),
              | f AS (SELECT media_id, width, height, n, k::int AS frame_no,
              |   substring(tx, k * n + 1, n) AS px FROM g, unnest([0, 1]) AS t(k)),
              | b AS (SELECT media_id, frame_no, width, height, n,
              |   list_transform(range(1, n + 1), i -> ord(substring(px, i, 1))) AS vs FROM f)
              |SELECT media_id, frame_no, width, height,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[1 + j * 3])) as bigint) AS r_sum,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[2 + j * 3])) as bigint) AS g_sum,
              | cast(list_sum(list_transform(range(0, n // 3), j -> vs[3 + j * 3])) as bigint) AS b_sum,
              | cast(list_min(vs) as bigint) AS min_v,
              | cast(list_max(vs) as bigint) AS max_v,
              | (n // 3)::bigint AS n_px,
              | vs[1]::bigint AS first_v,
              | vs[n]::bigint AS last_v
              |FROM b""".stripMargin)),

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
              |FROM documents, unnest([0,1,2,3]) AS t(i)""".stripMargin)),

    // ---- SemDeDup semantic dedup (k-means cells + within-cell cosine,
    //      keep-lowest-id), clone-gated: every 20th embedding is planted
    //      again at vec_id + 1e6 — an identical vector lands in the SAME
    //      cell deterministically (argmax over identical dots) at cosine
    //      1.0, so the clone MUST be dropped (its source id is smaller).
    //      kept_dup_pairs re-derives the construct's invariant in-query:
    //      the kept set is an independent set (no same-cell kept pair at
    //      cos >= t) — a drop-rule bug surfaces as a nonzero count, not a
    //      silent quality drift. (No zero-norm embeddings in this corpus,
    //      so the cosine zero-guard can't mask a clone.)
    Q("dedup_semantic",
      (s, dir) => {
        val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val clones = emb.filter(col("vec_id") % 20 === 7)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        val all = emb.unionByName(clones)
        val res = Similarity.semanticDedup(all, threshold = 0.995, nCells = 16)
        try {
          val clonesDropped = res.filter(col("id") >= 1000000L && !col("keep"))
            .agg(count(lit(1)).as("clones_dropped"))
          val kept = res.filter(col("keep"))
            .join(all.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
          val keptDupPairs = kept.as("a").join(kept.as("b"),
              col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
              col("a.id") < col("b.id"))
            .filter(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.995)
            .agg(count(lit(1)).as("kept_dup_pairs"))
          emb.agg(
              count(when(col("vec_id") % 20 === 7, lit(1))).as("n_planted"),
              (max(col("vec_id")) < 1000000L).as("id_space_ok"))
            .crossJoin(clonesDropped).crossJoin(keptDupPairs)
            .select(col("n_planted"), col("clones_dropped"),
              (col("clones_dropped") === col("n_planted")).as("all_dropped"),
              col("kept_dup_pairs"), col("id_space_ok"))
            .localCheckpoint(true)
        } finally graft.ops.Caching.release(res)
      },
      Some("""SELECT count(CASE WHEN vec_id % 20 = 7 THEN 1 END)::bigint AS n_planted,
              | count(CASE WHEN vec_id % 20 = 7 THEN 1 END)::bigint AS clones_dropped,
              | true AS all_dropped, 0::bigint AS kept_dup_pairs, true AS id_space_ok
              |FROM embeddings""".stripMargin)),

    // ---- hot-cell-capped SemDeDup: maxCellSize forces ceil(|cell|/cap)
    //      vector-hash sub-splits, bounding per-row candidate work at the
    //      cap — the df-cap analog for the cell self-join. The same
    //      guarantees survive the cap BY CONSTRUCTION (identical vectors
    //      hash to the same sub-cell, so planted clones must still drop;
    //      the kept set is still independent within (cell, sub)) and the
    //      oracle pins them; only cross-boundary NEAR-dup recall is traded.
    Q("dedup_semantic_capped",
      (s, dir) => {
        val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val clones = emb.filter(col("vec_id") % 20 === 7)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        val all = emb.unionByName(clones)
        val res = Similarity.semanticDedup(all, threshold = 0.995, nCells = 16,
          maxCellSize = Some(24L))
        try {
          val clonesDropped = res.filter(col("id") >= 1000000L && !col("keep"))
            .agg(count(lit(1)).as("clones_dropped"))
          val kept = res.filter(col("keep"))
            .join(all.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
          val keptDupPairs = kept.as("a").join(kept.as("b"),
              col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
              col("a.id") < col("b.id"))
            .filter(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.995)
            .agg(count(lit(1)).as("kept_dup_pairs"))
          emb.agg(
              count(when(col("vec_id") % 20 === 7, lit(1))).as("n_planted"),
              (max(col("vec_id")) < 1000000L).as("id_space_ok"))
            .crossJoin(clonesDropped).crossJoin(keptDupPairs)
            .select(col("n_planted"), col("clones_dropped"),
              (col("clones_dropped") === col("n_planted")).as("all_dropped"),
              col("kept_dup_pairs"), col("id_space_ok"))
            .localCheckpoint(true)
        } finally graft.ops.Caching.release(res)
      },
      Some("""SELECT count(CASE WHEN vec_id % 20 = 7 THEN 1 END)::bigint AS n_planted,
              | count(CASE WHEN vec_id % 20 = 7 THEN 1 END)::bigint AS clones_dropped,
              | true AS all_dropped, 0::bigint AS kept_dup_pairs, true AS id_space_ok
              |FROM embeddings""".stripMargin)),

    // ---- EXACT k-means over the embeddings (k=4, 2 Lloyd iterations):
    //      quantized-int64 arithmetic end to end makes every assignment and
    //      centroid update engine-replayable, so the oracle unrolls the SAME
    //      two iterations in SQL and must match counts, the member-id
    //      checksum (pinning the assignment itself), and the centroids'
    //      component sums — an ITERATIVE algorithm under the hash-exact
    //      gate, not just a one-shot aggregate.
    Q("emb_kmeans",
      (s, dir) => graft.ops.Similarity.kmeansExact(
        T(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 2),
      Some("""WITH eq AS (SELECT vec_id, list_transform(range(1, len(embedding) + 1),
              |         i -> cast(floor(embedding[i]::DOUBLE * 1000000) as bigint)) AS xq
              |       FROM embeddings),
              | c0 AS (SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS j, xq AS c
              |        FROM eq ORDER BY vec_id LIMIT 4),
              | a0 AS (SELECT vec_id, xq, j FROM (
              |        SELECT e.vec_id, e.xq, c.j,
              |          row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |            list_sum(list_transform(range(1, len(e.xq) + 1),
              |              i -> (e.xq[i] - c.c[i]) * (e.xq[i] - c.c[i]))), c.j) AS rn
              |        FROM eq e, c0 c) WHERE rn = 1),
              | c1 AS (SELECT j, list(cd ORDER BY d) AS c FROM (
              |        SELECT a.j, t.d,
              |          (sum(a.xq[t.d]) - (((sum(a.xq[t.d]) % count(*)) + count(*)) % count(*))) // count(*) AS cd
              |        FROM a0 a, unnest(range(1, len(a.xq) + 1)) AS t(d)
              |        GROUP BY a.j, t.d) GROUP BY j),
              | a1 AS (SELECT vec_id, xq, j FROM (
              |        SELECT e.vec_id, e.xq, c.j,
              |          row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |            list_sum(list_transform(range(1, len(e.xq) + 1),
              |              i -> (e.xq[i] - c.c[i]) * (e.xq[i] - c.c[i]))), c.j) AS rn
              |        FROM eq e, c1 c) WHERE rn = 1),
              | c2 AS (SELECT j, list(cd ORDER BY d) AS c FROM (
              |        SELECT a.j, t.d,
              |          (sum(a.xq[t.d]) - (((sum(a.xq[t.d]) % count(*)) + count(*)) % count(*))) // count(*) AS cd
              |        FROM a1 a, unnest(range(1, len(a.xq) + 1)) AS t(d)
              |        GROUP BY a.j, t.d) GROUP BY j),
              | a2 AS (SELECT vec_id, j FROM (
              |        SELECT e.vec_id, c.j,
              |          row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |            list_sum(list_transform(range(1, len(e.xq) + 1),
              |              i -> (e.xq[i] - c.c[i]) * (e.xq[i] - c.c[i]))), c.j) AS rn
              |        FROM eq e, c2 c) WHERE rn = 1)
              |SELECT cast(a2.j as bigint) AS cluster, count(*) AS n_vecs,
              | cast(sum(vec_id) as bigint) AS vec_id_sum, l.centroid_l1
              |FROM a2 JOIN (SELECT j, cast(list_sum(c) as bigint) AS centroid_l1 FROM c2) l
              |  ON a2.j = l.j
              |GROUP BY a2.j, l.centroid_l1""".stripMargin)),

    // Per-label embedding centroids (mean pooling — the k-means/SemDeDup
    // primitive surfaced as an oracle query). Cross-row float summation is
    // order-dependent, so each component is quantized FIRST:
    // floor(x·1e6) as a long — float→double is exact, the multiply is one
    // identical IEEE op in both engines, and floor has no rounding-mode
    // ambiguity (unlike decimal casts: DuckDB rounds the float's SHORTEST
    // decimal repr while Spark rounds the exact binary value, which
    // disagrees on ties). The long sum is exact, so partition order is
    // irrelevant; the final /1e6 and /n are single IEEE divisions of
    // identical operands. posexplode keys the map-side-combined aggregate
    // by (label, dim): shuffle rows = |labels| × dims, never corpus-sized.
    Q("emb_centroids",
      (s, dir) => T(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * lit(1000000.0)).cast("long")).as("sq"))
        .select(col("label"), col("dim"), col("n"),
          (col("sq").cast("double") / 1000000.0 / col("n")).as("c")),
      Some("""WITH e AS (SELECT label, cast(t.i - 1 as bigint) AS dim,
              |        cast(floor(embedding[t.i]::DOUBLE * 1000000) as bigint) AS xq
              |       FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i))
              |SELECT label, dim, count(*) AS n,
              | cast(sum(xq) as double) / 1000000 / count(*) AS c
              |FROM e GROUP BY label, dim""".stripMargin)),

    // ---- one-pass exact second-moment matrix (the covariance/PCA input):
    //      graft's gram_matrix TypedImperativeAggregate carries
    //      1 + d + d(d+1)/2 quantized-long sums through the shuffle
    //      (d=64 → ~17 KB state, map-side combined) instead of the n·d²
    //      rows a posexplode-pairs plan would move — the shape that makes
    //      covariance over 100 TB of embeddings one narrow pass. Quantized
    //      floor(x·1e6) sums (the emb_centroids idiom) are order-free
    //      EXACT, so DuckDB replays them bit-for-bit from an unnest join.
    Q("emb_gram",
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val d = emb.select(size(col("embedding"))).head().getInt(0)
        emb.agg(graft.functions.GramMatrix.gram_matrix(col("embedding"), d).as("g"))
          .select(explode(col("g")).as("r"))
          .select(col("r.i").as("i"), col("r.j").as("j"), col("r.v").as("v"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding[t.i]::DOUBLE AS x, t.i - 1 AS i
              |       FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
              |pairs AS (SELECT cast(a.i as int) AS i, cast(b.i as int) AS j,
              |        cast(sum(cast(floor(a.x * b.x * 1000000) as bigint)) as bigint) AS v
              |       FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
              |       GROUP BY 1, 2),
              |sums AS (SELECT cast(i as int) AS i, cast(-1 as int) AS j,
              |        cast(sum(cast(floor(x * 1000000) as bigint)) as bigint) AS v
              |       FROM e GROUP BY 1),
              |cnt AS (SELECT cast(-1 as int) AS i, cast(-1 as int) AS j,
              |        count(*)::bigint AS v FROM embeddings)
              |SELECT i, j, v FROM pairs
              |UNION ALL SELECT i, j, v FROM sums
              |UNION ALL SELECT i, j, v FROM cnt""".stripMargin)),

    // ---- PCA over the gram stats, gated like the ANN queries: ONE
    //      distributed pass builds the d×d covariance input (emb_gram's
    //      aggregate; the d²-sized collect is bounded by construction),
    //      the top-4 eigenpairs come from deterministic power iteration
    //      with deflation on the driver, and the claims that make the
    //      decomposition RIGHT are verified and pinned:
    //        ordered_ok    — eigenvalues descending (deflation sound);
    //        dominance_ok  — λ₁ ≥ max diagonal variance (λmax of a
    //                        symmetric PSD matrix dominates every diagonal
    //                        entry — a theorem, so any violation is a bug);
    //        trace_ok      — Σλ ≤ trace (PSD: remaining spectrum
    //                        nonnegative);
    //        proj_var_ok   — the DISTRIBUTED projection of the corpus onto
    //                        v₁ (array_dot) has variance within 1% of λ₁,
    //                        closing the loop between the driver's
    //                        eigenpair and the data it claims to explain.
    Q("emb_pca",
      (s, dir) => {
        import s.implicits._
        val emb = T(s, dir, "embeddings")
        val d = emb.select(size(col("embedding"))).head().getInt(0)
        val gram = emb
          .agg(graft.functions.GramMatrix.gram_matrix(col("embedding"), d).as("g"))
          .select(explode(col("g")).as("r"))
          .select(col("r.i"), col("r.j"), col("r.v"))
          .collect().toSeq // bounded: 1 + d + d(d+1)/2 rows (d ≤ 4096)
        val (n, sx, sxy) = graft.functions.GramMatrix.decode(gram, d)
        val cov = graft.functions.GramMatrix.covariance(n, sx, sxy)
        val eig = graft.functions.GramMatrix.topEigen(cov, 4)
        val lambdas = eig.map(_._1)
        val v1 = eig.head._2
        // Relative slack: power iteration is convergence-checked but a
        // near-degenerate spectrum (lambda2 ~ lambda1) can leave a residual
        // larger than any absolute epsilon at this scale.
        val tol = 1e-6 * math.max(lambdas.head.abs, 1e-12)
        val orderedOk = lambdas.sliding(2).forall(p => p.head >= p(1) - tol)
        val maxDiag = (0 until d).map(i => cov(i)(i)).max
        val dominanceOk = lambdas.head >= maxDiag - tol
        val trace = (0 until d).map(i => cov(i)(i)).sum
        val traceOk = lambdas.sum <= trace + 1e-6
        // Distributed check: variance of the corpus projected onto v1, over
        // the SAME population gram_matrix aggregated (well-formed d-length
        // vectors; count(p) skips null projections so a null row can't
        // inflate the denominator against sums that excluded it).
        val v1c = array(v1.map(lit).toIndexedSeq: _*)
        val stats = emb.filter(size(col("embedding")) === d)
          .select(
            graft.functions.VectorExpressions.array_dot(col("embedding"), v1c).as("p"))
          .agg(count(col("p")).cast("double").as("n"), sum(col("p")).as("s"),
            sum(col("p") * col("p")).as("ss")).head()
        val (pn, ps, pss) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
        val projVar = pss / pn - (ps / pn) * (ps / pn)
        val projVarOk = math.abs(projVar - lambdas.head) <= 0.01 * math.max(lambdas.head, 1e-12)
        Seq((n, d, orderedOk, dominanceOk, traceOk, projVarOk))
          .toDF("n", "d", "ordered_ok", "dominance_ok", "trace_ok", "proj_var_ok")
      },
      Some("""SELECT count(*)::bigint AS n, cast(max(len(embedding)) as int) AS d,
              | true AS ordered_ok, true AS dominance_ok,
              | true AS trace_ok, true AS proj_var_ok
              |FROM embeddings""".stripMargin)),

    // ---- top-m PCA: the deflation loop's FULL output, with the
    //      distributed closure emb_pca runs for v₁ extended to EVERY
    //      eigenpair — and still one distributed pass: all m projections
    //      are evaluated as m array_dot columns in a single scan, one agg
    //      carries 2m+1 sums. Per eigenpair k the row pins:
    //        proj_var_ok — corpus variance along v_k within 1% of λ_k
    //                      (the eigenpair explains exactly the variance it
    //                      claims — per-direction, not just the dominant);
    //        orth_ok     — v_k ⊥ every earlier eigenvector (deflation
    //                      didn't leak previous directions);
    //        residual_ok — ‖cov·v_k − λ_k·v_k‖ small relative to λ₁ (the
    //                      pair is an actual eigenpair of the covariance,
    //                      not merely a converged direction).
    Q("emb_pca_topm",
      (s, dir) => {
        import s.implicits._
        val m = 4
        val emb = T(s, dir, "embeddings")
        val d = emb.select(size(col("embedding"))).head().getInt(0)
        val gram = emb
          .agg(graft.functions.GramMatrix.gram_matrix(col("embedding"), d).as("g"))
          .select(explode(col("g")).as("r"))
          .select(col("r.i"), col("r.j"), col("r.v"))
          .collect().toSeq // bounded: 1 + d + d(d+1)/2 rows (d ≤ 4096)
        val (n, sx, sxy) = graft.functions.GramMatrix.decode(gram, d)
        val cov = graft.functions.GramMatrix.covariance(n, sx, sxy)
        val eig = graft.functions.GramMatrix.topEigen(cov, m)
        val l1 = eig.head._1
        // ONE distributed pass for all m projection-variance closures.
        val projCols = eig.zipWithIndex.map { case ((_, v), k) =>
          graft.functions.VectorExpressions.array_dot(col("embedding"),
            array(v.map(lit).toIndexedSeq: _*)).as(s"p$k") }
        val aggs = count(lit(1)).cast("double").as("cnt") +:
          (0 until m).flatMap(k => Seq(
            sum(col(s"p$k")).as(s"s$k"),
            sum(col(s"p$k") * col(s"p$k")).as(s"ss$k")))
        val stats = emb.filter(size(col("embedding")) === d)
          .select(projCols: _*).agg(aggs.head, aggs.tail: _*).head()
        val cnt = stats.getDouble(0)
        val rows = eig.zipWithIndex.map { case ((lk, vk), k) =>
          val sK = stats.getDouble(1 + 2 * k)
          val ssK = stats.getDouble(2 + 2 * k)
          val projVar = ssK / cnt - (sK / cnt) * (sK / cnt)
          // 1% relative per eigenpair, floored by the 1e-6 quantization
          // granularity of the gram sums scaled into λ₁'s magnitude.
          val projVarOk = math.abs(projVar - lk) <= 0.01 * math.max(lk, 1e-12) + 1e-6 * l1
          val orthOk = eig.take(k).forall { case (_, vj) =>
            math.abs(vk.zip(vj).map { case (a, b) => a * b }.sum) <= 1e-6 }
          val resid = math.sqrt((0 until d).map { i =>
            var sI = 0.0; var j = 0
            while (j < d) { sI += cov(i)(j) * vk(j); j += 1 }
            val r = sI - lk * vk(i); r * r
          }.sum)
          val residualOk = resid <= 1e-6 * math.max(l1, 1e-12)
          ((k + 1).toLong, n, d, projVarOk, orthOk, residualOk)
        }
        rows.toDF("k", "n", "d", "proj_var_ok", "orth_ok", "residual_ok")
      },
      Some("""SELECT cast(r.range + 1 as bigint) AS k, s.n, s.d,
              | true AS proj_var_ok, true AS orth_ok, true AS residual_ok
              |FROM range(4) r,
              | (SELECT count(*)::bigint AS n, cast(max(len(embedding)) as int) AS d
              |  FROM embeddings) s""".stripMargin))
  )
}
