package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sync.SchemaCompare
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / shingles / fingerprint basics") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val row = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      size(TextAnalysis.shingles($"text", 3)).as("nsh"),
      TextAnalysis.docFingerprint($"text", 3).as("fp")).head()
    assert(row.getInt(0) == 9)
    assert(row.getInt(1) == 7) // 9 - 3 + 1
  }

  test("empty text is safe everywhere") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val rows = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.punctRatio($"text"),
      TextAnalysis.stopwordHitRatio($"text"),
      TextAnalysis.meanTokenLen($"text"),
      TextAnalysis.langId($"text")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == 0); assert(r.getDouble(1) == 0.0)
      assert(r.getString(4) == "und")
    }
  }

  test("langId votes by marker tokens") {
    val df = Seq(
      (1L, "the cat and the dog is that with for"),
      (2L, "der hund und die katze ist nicht mit ein"),
      (3L, "le chat et la maison est pas pour que")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "de"); assert(got(3L) == "fr")
  }

  test("exact dedup keeps min-id representative") {
    val df = Seq((5L, "dup"), (2L, "dup"), (3L, "uniq")).toDF("doc_id", "text")
    val kept = Dedup.dedupExact(df, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 3L)))
  }

  test("minhash LSH finds a planted near-duplicate") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val nearDup = base.replace("gamma", "gamma2") // small edit
    val other = "one two three four five six seven eight nine ten " * 5
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 16, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical text → identical hash; near text → small hamming") {
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data"),
      (2L, "spark is a unified analytics engine for large scale data"),
      (3L, "spark is a unified analytics engine for big scale data")).toDF("id", "text")
    val hs = df.select($"id", Dedup.simhash($"text").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) < 16)
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 1L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val top = Similarity.bruteForceTopK(q, df, k = 3)
      .select("vec_id", "sim").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(top(1L) - 1.0) < 1e-12)
    assert(math.abs(top(3L) - 1.0) < 1e-12) // same direction
    assert(math.abs(top(2L)) < 1e-12)
  }

  test("lshTopK finds planted near-neighbors (the guarantee LSH provides)") {
    // Sign-bucket LSH has collision prob (1-θ/π)^planes — near-zero for
    // uniform random vectors (θ≈65°), near-one for true near-dups (θ≈0).
    // So the correct recall test plants close clones of each query.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // clones: same vector under a shifted id, slightly perturbed first dim
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val approx = Similarity.lshTopK(q, corpus, 3, nPlanes = 8, tables = 8, dim = 64)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"clone of $qid not found: $approx")
  }

  test("ivfTopK: decent recall vs brute force, perfect on planted clones") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val exact = Similarity.bruteForceTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(q, corpus, 10, nCells = 8, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted clone is the #1 neighbor — must always be probed
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"clone of $qid not found")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
  }

  test("pqTopK finds planted near-neighbors; coarse recall on noise is bounded") {
    // 8×16 product quantization on near-orthogonal noise scrambles the WEAK
    // orderings (recall@10 ≈ 0.3 here, deterministic) — but true near-dups
    // survive quantization, which is the property PQ promises (same framing
    // as the LSH test).
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val exact = Similarity.bruteForceTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"clone of $qid not found")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.15, s"PQ recall@10 collapsed: $recall")
  }

  test("ivfPqTopK: composed index still finds planted clones") {
    // IVF bounds candidates (probed cells), PQ bounds per-vector scoring —
    // the near-identical clone must land in the query's probed cells and
    // survive PQ ranking (the composed layout's end-to-end guarantee).
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val approx = Similarity.ivfPqTopK(q, corpus, 10, nCells = 8, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"clone of $qid not found")
  }

  test("sq8TopK: near-lossless recall vs brute force") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.sq8TopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization error is tiny relative to neighbor gaps — ranking
    // should survive nearly intact.
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 recall@10 too low: $recall")
  }

  test("bqTopK: planted clones survive the bit scan; rerank recovers recall") {
    // 1 bit/dim: a near-identical clone keeps an (almost) identical sign
    // pattern, so its Hamming distance is ~0 and it must lead the candidate
    // list; the exact rerank then ranks it #1. On noise, 64-bit Hamming is a
    // coarse cosine proxy — the rerank buffer (64 candidates over this
    // ~600-row corpus) keeps recall moderate, not lossless.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val exact = Similarity.bruteForceTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.bqTopK(q, corpus, 10, rerank = 64)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"clone of $qid not found")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"BQ recall@10 too low: $recall")
  }

  test("ivfBqTopK: composed cells+bits still find planted clones") {
    // The clone shares the query's cell (probed) and its sign pattern
    // (Hamming ~0), so it must survive both bounding stages and lead the
    // exact rerank — the composed layout's end-to-end guarantee.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val approx = Similarity.ivfBqTopK(q, corpus, 10, nCells = 8, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L to 2L)
      assert(approx.contains((qid, qid + 10000L)), s"clone of $qid not found")
  }

  test("approx percentiles track exact percentiles within sketch error") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val got = li.agg(
      percentile($"l_quantity", lit(0.5)).as("exact"),
      percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("approx")).head()
    // integral-valued quantities, 1000-bucket accuracy: the sketch must land
    // within one unit of the exact median
    assert(math.abs(got.getDouble(0) - got.getDouble(1)) <= 1.0,
      s"approx median ${got.getDouble(1)} vs exact ${got.getDouble(0)}")
  }

  test("containment pairs: planted subset detected, symmetric dilution visible") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta"), // contained prefix of 1
      (3L, "totally different words here entirely")).toDF("doc_id", "text")
    val got = Dedup.containmentPairsInverted(docs, "doc_id", "text", shingleK = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // doc2's shingles all appear in doc1 → containment(2 in 1) = 1.0;
    // the reverse direction is diluted below the threshold.
    assert(got == List((2L, 1L, 1.0)), s"got $got")
  }

  test("multimodal: meta derivation + deterministic decode + frame sampling") {
    val df = Seq((1L, "hello world payload"), (2L, "another payload body x"))
      .toDF("media_id", "text")
      .select($"media_id", $"text".cast("binary").as("payload"))
    val meta = Multimodal.withMediaMeta(df, "payload", "image", "raw")
      .select("meta.n_bytes", "meta.checksum").collect()
    assert(meta.forall(_.getLong(0) > 0))

    val f1 = Multimodal.extractImageFeatures(df, "media_id", "payload", embeddingDim = 4).collect()
    val f2 = Multimodal.extractImageFeatures(df, "media_id", "payload", embeddingDim = 4).collect()
    assert(f1.map(_.toString).sorted.sameElements(f2.map(_.toString).sorted)) // deterministic
    assert(f1.forall(_.getAs[Seq[Float]]("embedding").length == 4))

    val frames = Multimodal.sampleFrames(df, "media_id", "payload", n = 4)
    assert(frames.count() == 8)
  }

  test("as-of join: most recent prior match, inclusive ties, null when none") {
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L), (1L, 200L), (1L, 300L), (3L, 10L))
      .toDF("k", "ts")
    val got = graft.ops.Joins.asofJoinBackward(left, right, Seq("k"),
        leftTs = "ts", rightTs = "ts", valueCol = "ts", outCol = "m")
      .select($"tag", $"m").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("p1") == Some(100L)) // tie at same instant matches (inclusive)
    assert(got("p2") == Some(200L)) // most recent prior, not the later 300
    assert(got("p3") == None)       // no right rows for k=2
  }

  test("bucketed range join equals the naive inequality join") {
    val points = Seq.tabulate(200)(i => (i.toLong * 7, i.toLong)).toDF("ts_us", "v")
    val ranges = Seq((0L, 100L), (95L, 250L), (500L, 1300L), (1300L, 1300L))
      .toDF("r_start", "r_end")
    val fast = graft.ops.Joins.bucketedRangeJoin(points, "ts_us", ranges,
        "r_start", "r_end", bucketWidth = 64L)
      .select("ts_us", "r_start").as[(Long, Long)].collect().sorted
    val naive = points.join(ranges,
        $"ts_us" >= $"r_start" && $"ts_us" < $"r_end")
      .select("ts_us", "r_start").as[(Long, Long)].collect().sorted
    assert(fast.sameElements(naive) && fast.nonEmpty)
  }

  test("LSH cosine near-dup recall vs exact baseline on testdata embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosinePairsExact(emb, threshold = 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDups(emb, threshold = 0.45,
        nPlanes = 4, tables = 24, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact))            // no false positives (exact verify)
    assert(lsh.size >= exact.size * 0.8)   // ≥80% recall at these parameters
  }

  test("HLL sketched distinct within declared error of exact") {
    val df = Seq.tabulate(5000)(i => (i % 700).toLong).toDF("u")
    val approx = df.agg(approx_count_distinct($"u", 0.02)).head().getLong(0)
    assert(math.abs(approx - 700.0) / 700.0 < 0.1)
  }

  test("DDL normalization goldens (reference O2/F5)") {
    assert(SchemaCompare.stripAutoIncrement(
      "CREATE TABLE t (...) ENGINE=InnoDB AUTO_INCREMENT=123 DEFAULT CHARSET=utf8") ==
      "CREATE TABLE t (...) ENGINE=InnoDB DEFAULT CHARSET=utf8")
    val ddl = "CREATE TABLE t (\n  `a` int,\n  CONSTRAINT `z_fk` FOREIGN KEY (`a`) REFERENCES x (`a`),\n  CONSTRAINT `a_fk` FOREIGN KEY (`b`) REFERENCES y (`b`)\n)"
    val norm = SchemaCompare.alphabetizeConstraints(ddl)
    val lines = norm.split("\n").map(_.trim).filter(_.startsWith("CONSTRAINT"))
    assert(lines.head.startsWith("CONSTRAINT `a_fk`"))
    assert(lines.head.endsWith(","))
    assert(!lines.last.endsWith(","))
  }

  test("packChunks: exact chunk assignment, spanning docs, full fills") {
    import graft.ops.Packing
    // one shard, L=10: docs of 4,4,5,9 tokens → stream offsets 0,4,8,13
    // doc 3 (5 tokens at offset 8) spans chunks 0 (2 tokens) and 1 (3);
    // doc 4 (9 at 13) spans chunks 1 (7) and 2 (2).
    val docs = Seq(("s", 1L, 4L), ("s", 2L, 4L), ("s", 3L, 5L), ("s", 4L, 9L))
      .toDF("source", "doc_id", "n")
    val packed = Packing.packChunks(docs, "doc_id", "n", seqLen = 10, Some("source"))
      .select($"doc_id", $"chunk_id", $"n_tokens_in_chunk").as[(Long, Long, Long)]
      .collect().toSet
    assert(packed == Set((1L, 0L, 4L), (2L, 0L, 4L), (3L, 0L, 2L), (3L, 1L, 3L),
      (4L, 1L, 7L), (4L, 2L, 2L)))
    val stats = Packing.chunkStats(docs, "doc_id", "n", 10, Some("source"))
      .orderBy("chunk_id").select($"n_tokens").as[Long].collect()
    assert(stats.sameElements(Array(10L, 10L, 2L))) // full, full, tail
  }

  test("packChunks: zero-token docs occupy no chunk and shift nothing") {
    import graft.ops.Packing
    val docs = Seq(("s", 1L, 3L), ("s", 2L, 0L), ("s", 3L, 3L)).toDF("source", "doc_id", "n")
    val packed = Packing.packChunks(docs, "doc_id", "n", seqLen = 4, Some("source"))
      .select($"doc_id", $"chunk_id", $"n_tokens_in_chunk").as[(Long, Long, Long)]
      .collect().toSet
    assert(packed == Set((1L, 0L, 3L), (3L, 0L, 1L), (3L, 1L, 2L)))
  }

  test("globalRowNumber matches the single-partition window exactly") {
    import graft.ops.{Packing, Sampling}
    val df = (1L to 1000L).toDF("id")
    val distributed = Packing.globalRowNumber(df, "id", nBuckets = 20)
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(Sampling.hashBucket($"id"), $"id")
    val single = df.withColumn("rn", row_number().over(w).cast("long"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(distributed == single)
  }

  test("shardManifest: exact shard boundaries, sizes, and checksums") {
    import graft.ops.Packing
    val df = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "sz")
    val m = Packing.shardManifest(df, "id", "sz", shardSize = 30, nBuckets = 10)
      .orderBy("shard_id")
      .select($"shard_id", $"n_docs", $"total_size", $"id_sum")
      .as[(Long, Long, Long, Long)].collect()
    assert(m.map(_._1).sameElements(Array(0L, 1L, 2L, 3L)))
    assert(m.map(_._2).sameElements(Array(30L, 30L, 30L, 10L)))
    assert(m.map(_._3).sum == (1L to 100L).map(_ * 10).sum)
    assert(m.map(_._4).sum == (1L to 100L).sum)
  }

  test("hash sampling: deterministic, monotone in rate, exact at the ends") {
    import graft.ops.Sampling
    val df = (1L to 500L).toDF("id")
    assert(Sampling.hashSample(df, "id", 1.0).count() == 500)
    assert(Sampling.hashSample(df, "id", 0.0).count() == 0)
    val k30a = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    val k30b = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    val k60 = Sampling.hashSample(df, "id", 0.6).select("id").as[Long].collect().toSet
    assert(k30a == k30b)                       // reproducible
    assert(k30a.subsetOf(k60))                 // nested samples
    assert(k30a.size > 100 && k30a.size < 200) // ~150 expected
  }

  test("mixSources applies per-source rates with a default") {
    import graft.ops.Sampling
    val df = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val mixed = Sampling.mixSources(df, "id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val bySrc = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 100)
    assert(!bySrc.contains("src1"))
    assert(bySrc("src2") > 20 && bySrc("src2") < 80)
  }

  test("mixByTemperature: rates follow n^(alpha-1), smallest source keeps all, endpoints behave") {
    import graft.ops.Sampling
    // 400/100/25 docs across three sources — 16:4:1 size ratios.
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 500L).map(i => (i, "mid")) ++
      (501L to 525L).map(i => (i, "small"))).toDF("id", "source")

    val (_, bps) = Sampling.mixByTemperature(df, "id", "source", alpha = 0.5)
    // r_s = sqrt(n_min / n_s): small → 1.0, mid → 1/2, big → 1/4.
    assert(bps == Map("small" -> 10000, "mid" -> 5000, "big" -> 2500))

    // alpha = 1: passthrough — every source keeps everything.
    val (all, bps1) = Sampling.mixByTemperature(df, "id", "source", alpha = 1.0)
    assert(bps1.values.forall(_ == 10000) && all.count() == 525L)

    // alpha = 0: expected kept counts equalize (rate ∝ 1/n).
    val (_, bps0) = Sampling.mixByTemperature(df, "id", "source", alpha = 0.0)
    assert(bps0 == Map("small" -> 10000, "mid" -> 2500, "big" -> 625))

    // Determinism: the same call keeps the same rows.
    val (a, _) = Sampling.mixByTemperature(df, "id", "source", alpha = 0.5)
    val (b, _) = Sampling.mixByTemperature(df, "id", "source", alpha = 0.5)
    assert(a.select("id").as[Long].collect().toSet ==
      b.select("id").as[Long].collect().toSet)
  }

  test("mixByTemperature floors quantized rates at 1 bps — no source silently vanishes") {
    import graft.ops.Sampling
    // At alpha = 0 the keep rate is n_min/n_s; 1 vs 30000 rows rounds to
    // 0 bps (0.33) without the floor — the source would drop out of the
    // mix entirely instead of being heavily downsampled.
    val df = spark.range(0L, 30000L).selectExpr("id", "'big' AS source")
      .unionByName(Seq((900001L, "tiny")).toDF("id", "source"))
    val (_, bps) = Sampling.mixByTemperature(df, "id", "source", alpha = 0.0)
    assert(bps("tiny") == 10000)
    assert(bps("big") == 1, s"expected the 1-bps floor, got ${bps("big")}")
  }

  test("decontaminationPairs finds a planted benchmark extract") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val bench = Seq(
      (101L, "gamma delta epsilon zeta eta"),   // contained in doc 1
      (102L, "totally unrelated words here now")).toDF("doc_id", "text")
    val pairs = Dedup.decontaminationPairs(corpus, bench, "doc_id", "text",
        shingleK = 3, threshold = 0.6)
      .select($"corpus_id", $"bench_id", $"contamination").as[(Long, Long, Double)]
      .collect().toSet
    assert(pairs == Set((1L, 101L, 1.0)))
  }

  test("decontaminationPairsBloom ≡ exact pairs (no false negatives by construction)") {
    // Real documents corpus vs a planted 15-token benchmark extract — the
    // Bloom pre-filter may flag extra docs (false positives) but the exact
    // stage behind it must reproduce the exact operator's output verbatim.
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val bench = docs.filter($"doc_id" % 50 === 7)
      .select(($"doc_id" + 100000L).as("doc_id"),
        concat_ws(" ", slice(graft.ops.TextAnalysis.tokens($"text"), 1, 15)).as("text"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"corpus_id", $"bench_id", round($"contamination", 9))
        .as[(Long, Long, Double)].collect().toSet
    val exact = canon(Dedup.decontaminationPairs(docs, bench, "doc_id", "text",
      shingleK = 3, threshold = 0.6))
    val bloom = canon(Dedup.decontaminationPairsBloom(docs, bench, "doc_id", "text",
      shingleK = 3, threshold = 0.6))
    assert(exact.nonEmpty, "fixture must plant contamination")
    assert(bloom == exact, s"bloom path diverged: missing=${exact -- bloom} extra=${bloom -- exact}")
  }

  test("bloom_hits: planted members always hit, disjoint sets can miss, null is null") {
    import graft.functions.VectorExpressions.bloom_hits
    val members = (1L to 1000L).map(_ * 2654435761L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    members.foreach(bf.putLong)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    val df = Seq(
      (1L, Some(members.take(5))),            // all members → exactly 5 hits
      (2L, Some(Seq(members.head, -1L))),     // mixed: >= 1 hit guaranteed
      (3L, Some(Seq.empty[Long])),            // empty array → 0
      (4L, Option.empty[Seq[Long]])           // null array → null
    ).toDF("id", "hs")
    val out = df.select($"id", bloom_hits($"hs", bytes).as("hits"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out(1L) == 5, s"false negative: ${out(1L)} of 5 members hit")
    assert(out(2L) >= 1)
    assert(out(3L) == 0)
    assert(out(4L) == -1)
  }

  test("ivfPqResidualTopK: finds planted clones; recall not below raw IVF-PQ") {
    // Residual codes spend the budget on within-cell offsets — on this
    // fixture recall must be at least the raw variant's (FAISS's rationale).
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val clones = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x * 1.01f).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 3).select("vec_id", "embedding").unionByName(clones)
    val exact = Similarity.bruteForceTopK(q, corpus, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Double) = {
      val s = df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (s, exact.intersect(s).size.toDouble / exact.size)
    }
    val (res, resRecall) = recallOf(Similarity.ivfPqResidualTopK(q, corpus, 10, nCells = 8, nProbe = 3))
    val (_, rawRecall) = recallOf(Similarity.ivfPqTopK(q, corpus, 10, nCells = 8, nProbe = 3))
    for (qid <- 0L to 2L)
      assert(res.contains((qid, qid + 10000L)), s"clone of $qid not found")
    assert(resRecall >= rawRecall,
      s"residual recall $resRecall below raw IVF-PQ recall $rawRecall")
  }

  test("chunkDocuments: full coverage, declared overlap, clipped tail") {
    import graft.ops.TextAnalysis
    // 11 tokens, chunk 4, overlap 2 → stride 2, starts 0,2,4,6,8 (ceil
    // ((11-4)/2)=4 → 5 chunks), last clipped to 3 tokens.
    val docs = Seq(
      (1L, (1 to 11).map(i => s"t$i").mkString(" ")),
      (2L, "a b"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 2)
      .select("id", "chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._4)).toSeq ==
      Seq((0L, 4L), (2L, 4L), (4L, 4L), (6L, 4L), (8L, 3L)))
    assert(d1.head._5 == "t1 t2 t3 t4" && d1.last._5 == "t9 t10 t11")
    // consecutive chunks share exactly `overlap` tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      val at = a._5.split(" ").toSeq; val bt = b._5.split(" ").toSeq
      assert(at.takeRight(2) == bt.take(2), s"overlap broken: $a $b")
    }
    // every token covered exactly once ignoring overlap re-reads
    assert(d1.flatMap(_._5.split(" ")).toSet == (1 to 11).map(i => s"t$i").toSet)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 2L, "a b")))
    assert(!out.exists(_._1 == 3L), "empty doc must yield no chunks")
  }

  test("bm25TopK matches a hand-computed reference and ranks tf/dl correctly") {
    import graft.ops.TextAnalysis
    // 4 docs, query {x}: doc 1 dense short (top), doc 2 same tf longer
    // (penalized by dl), doc 3 one hit, doc 4 none (excluded).
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x x x y y y y y"),
      (3L, "x y y y"),
      (4L, "y y")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("x"), topK = 10)
      .select("id", "dl", "score").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "zero-score docs must be excluded")
    // reference: N=4, df=3, idf=ln((4-3+0.5)/(3+0.5)+1); avgdl=(4+8+4+2)/4
    val idf = math.log((4.0 - 3.0 + 0.5) / (3.0 + 0.5) + 1.0)
    val avgdl = 18.0 / 4.0
    def ref(tf: Double, dl: Double): Double =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((4L, ref(3, 4))))
    assert(out(2L) == ((8L, ref(3, 8))))
    assert(out(3L) == ((4L, ref(1, 4))))
    assert(out(1L)._2 > out(2L)._2, "same tf, longer doc must score lower")
    assert(out(2L)._2 > out(3L)._2, "higher tf must beat lower tf here")
  }
}
