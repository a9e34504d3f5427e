package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Cross-doc duplicated-block removal and SemDeDup semantic dedup. */
class BlockDedupSpec extends SparkSpec {
  import spark.implicits._

  test("removeDuplicateBlocks drops cross-doc blocks, keeps within-doc repeats") {
    // Block width 2. "x y" appears in docs 1 and 2 (cross-doc → removed
    // everywhere, including doc 1's second copy). "p q" repeats only
    // WITHIN doc 3 (df = 1 → kept, both copies). Doc 4 is entirely
    // boilerplate ("x y" twice → emptied, still present in the output).
    // Doc 5 is empty text. Doc 6 has a 3-word tail (partial last block).
    val docs = Seq(
      (1L, "x y a b x y"),
      (2L, "x y c d"),
      (3L, "p q p q"),
      (4L, "x y x y"),
      (5L, ""),
      (6L, "u v w")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateBlocks(docs, "doc_id", "text",
        blockWords = 2, minDf = 2L)
      .select("id", "n_blocks", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 2L, "a b")))
    assert(out(2L) == ((2L, 1L, "c d")))
    assert(out(3L) == ((2L, 0L, "p q p q")))
    assert(out(4L) == ((2L, 2L, "")))
    assert(out(5L) == ((0L, 0L, "")))
    assert(out(6L) == ((2L, 0L, "u v w")))
    assert(out.size == 6)
  }

  test("semanticDedup drops identical vectors and keeps an independent set") {
    // Two well-separated directions; ids 1/2/3 are the same unit vector
    // (exact dups), 10 is a near-dup of them (cos ≈ 0.9998), 20/21
    // orthogonal to the first group and near-identical to each other.
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (1L, v(1, 0, 0, 0)), (2L, v(1, 0, 0, 0)), (3L, v(1, 0, 0, 0)),
      (10L, v(1, 0.02, 0, 0)),
      (20L, v(0, 0, 1, 0)), (21L, v(0, 0, 1, 0.01))
    ).toDF("vec_id", "embedding")
    val res = Similarity.semanticDedup(corpus, threshold = 0.999, nCells = 2)
      .select("id", "cell", "keep").as[(Long, Int, Boolean)].collect()
    val keep = res.map(r => r._1 -> r._3).toMap
    assert(res.length == 6)
    assert(keep(1L), "lowest id of the dup group must survive")
    assert(!keep(2L) && !keep(3L), "identical vectors with a smaller-id twin must drop")
    assert(keep(20L) && !keep(21L), "near-identical pair keeps only the lower id")
    // Independent set: no two kept rows in one cell at cos >= threshold.
    val kept = res.filter(_._3).map(_._1).toSet
    val vecs = corpus.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum)
      if (n == 0) 0.0 else d / n
    }
    val cellOf = res.map(r => r._1 -> r._2).toMap
    for (a <- kept; b <- kept if a < b && cellOf(a) == cellOf(b))
      assert(cos(vecs(a), vecs(b)) < 0.999, s"kept near-dup pair ($a,$b)")
  }

  test("semanticDedup cap: generous cap is a no-op, tiny cap still drops exact dups") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // 12 exact copies of one vector + 4 of another: with cap 3 the hot
    // cell MUST sub-split, yet identical vectors share the content hash,
    // so every non-minimum copy still drops.
    val corpus = ((1L to 12L).map(i => (i, v(1, 0, 0, 0))) ++
      (20L to 23L).map(i => (i, v(0, 0, 1, 0)))).toDF("vec_id", "embedding")
    val uncapped = Similarity.semanticDedup(corpus, threshold = 0.999, nCells = 2)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    val generous = Similarity.semanticDedup(corpus, threshold = 0.999, nCells = 2,
        maxCellSize = Some(1000L))
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(generous == uncapped, "a cap above every cell size must not change results")
    val tiny = Similarity.semanticDedup(corpus, threshold = 0.999, nCells = 2,
        maxCellSize = Some(3L))
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(tiny.size == 16)
    // Exact-duplicate groups: exactly one survivor each (the group minimum
    // within its sub-cell chain — at least the global min survives, and no
    // sub-cell may keep two identical vectors).
    assert(tiny(1L) && !(2L to 12L).exists(tiny), s"hot group must keep only id 1: $tiny")
    assert(tiny(20L) && !(21L to 23L).exists(tiny))
  }

  test("removeDuplicateBlocks matches a reference implementation on random corpora") {
    // Tiny vocab forces heavy cross-doc block collisions; includes empty
    // docs, partial tail blocks, and fully-wiped docs.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val bw = 2
    val blocksOf: Map[Long, Seq[String]] = docs.map { case (id, t) =>
      val ws = if (t.trim.isEmpty) Seq.empty[String] else t.trim.split("\\s+").toSeq
      id -> ws.grouped(bw).map(_.mkString(" ")).toSeq
    }.toMap
    val hot = blocksOf.toSeq
      .flatMap { case (id, bs) => bs.distinct.map(b => (b, id)) }
      .groupBy(_._1).collect { case (b, ds) if ds.size >= 2 => b }.toSet
    val expected = docs.map { case (id, _) =>
      val bs = blocksOf(id)
      val kept = bs.filterNot(hot)
      id -> ((bs.size.toLong, (bs.size - kept.size).toLong, kept.mkString(" ")))
    }.toMap
    val out = graft.ops.Dedup.removeDuplicateBlocks(
        docs.toDF("doc_id", "text"), "doc_id", "text", blockWords = bw, minDf = 2L)
      .select("id", "n_blocks", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == expected)
    assert(expected.values.exists(_._2 > 0), "fixture should remove something")
    assert(expected.values.exists(v => v._1 > 0 && v._3.isEmpty),
      "fixture should fully wipe at least one doc")
  }

  test("globalRowNumber is a bijection onto 1..n for sparse and negative ids") {
    val rnd = new scala.util.Random(7)
    val ids = Iterator.continually(rnd.nextLong() % 1000000000L).distinct.take(300).toSeq
    val out = graft.ops.Packing.globalRowNumber(ids.toDF("id"), "id", nBuckets = 25)
      .select("id", "rn").as[(Long, Long)].collect()
    assert(out.length == 300)
    assert(out.map(_._2).sorted.toSeq == (1L to 300L).toSeq)
    // Rank order must agree with the declared (hashBucket, id) sort.
    val byRank = out.sortBy(_._2).map(_._1)
    val hb = ids.toDF("id")
      .select($"id", graft.ops.Sampling.hashBucket($"id").as("hb"))
      .as[(Long, Long)].collect().toMap
    val want = ids.sortBy(id => (hb(id), id))(Ordering.Tuple2[Long, Long])
    assert(byRank.sameElements(want))
  }

  test("winnowing: shared >= w+k-1 token substrings share a fingerprint") {
    import graft.ops.TextAnalysis
    // k=3, w=4: any shared run of >= 6 tokens must yield a common
    // fingerprint. Docs 1/2 share a 7-token run embedded in different
    // contexts; doc 3 is disjoint.
    val shared = "q1 q2 q3 q4 q5 q6 q7"
    val docs = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 b2 b3 $shared b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .select("id", "fp_hash").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must produce a shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs should not collide on this fixture")
    // Density sanity: selected fingerprints are a strict subset of grams.
    assert(fps(1L).size < 9, "winnowing must subsample the gram stream")
  }

  test("winnowOverlapPairs surfaces the overlapping pair and honors the cap") {
    import graft.ops.TextAnalysis
    val shared = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    val docs = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 b2 b3 $shared b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9")).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // A generous cap changes nothing; a cap of 1 removes every shared
    // fingerprint (each is in 2 docs) and with it the pair.
    val capped = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2L, maxFpDf = Some(5L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == pairs)
    val tight = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2L, maxFpDf = Some(1L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(tight.isEmpty)
  }

  test("winnowOverlapSpans reconstructs the planted span on its diagonal") {
    import graft.ops.TextAnalysis
    // doc 1 embeds the 10-token run at token 2, doc 2 at token 3 → every
    // true match anchor lies on diagonal +1; the span must land inside the
    // shared region in BOTH docs and map across by exactly that offset.
    val shared = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    val docs = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 b2 b3 $shared b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9")).toDF("doc_id", "text")
    val spans = TextAnalysis.winnowOverlapSpans(docs, "doc_id", "text",
      k = 3, w = 4, minFps = 1L)
    val rows = spans.collect()
    assert(rows.nonEmpty, "planted overlap must produce a span")
    assert(rows.forall(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "only the overlapping pair may report spans")
    rows.foreach { r =>
      val (sa, ea, sb, eb) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sb - sa == 1L && eb - ea == 1L, s"span must sit on diagonal +1: $r")
      // shared grams in doc 1 live at positions 2..9 (k=3 → last token 11)
      assert(sa >= 2L && ea <= 11L, s"span outside the shared region: $r")
      assert(r.getLong(6) >= 1L)
    }
    // one run must cover a >= w+k-1 stretch of the planted region
    assert(rows.exists(r => r.getLong(3) - r.getLong(2) >= 5L),
      "chained anchors should cover most of the 10-token run")
  }

  test("removeDuplicateSpans removes covered tokens at any alignment") {
    // spanK 2, minCount 2. "x y" occurs in docs 1 and 2 at DIFFERENT
    // offsets (unaligned — invisible to the blocks op at width 2 for doc
    // 2's copy), so tokens covered by it drop everywhere. "p p" repeats
    // within doc 3 alone — total-occurrence counting still removes it
    // (both copies + the bridging "p p" window ⇒ the whole run). Doc 4 is
    // only the duplicated span (emptied, still present). Doc 5 empty text;
    // doc 6 a single token (no 2-gram, untouched).
    val docs = Seq(
      (1L, "x y a b"),
      (2L, "c x y d"),
      (3L, "p p p q"),
      (4L, "x y"),
      (5L, ""),
      (6L, "z")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text",
        spanK = 2, minCount = 2L)
      .select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 2L, "a b")))
    assert(out(2L) == ((4L, 2L, "c d")))
    assert(out(3L) == ((4L, 3L, "q")))
    assert(out(4L) == ((2L, 2L, "")))
    assert(out(5L) == ((0L, 0L, "")))
    assert(out(6L) == ((1L, 0L, "z")))
    assert(out.size == 6)
  }

  test("removeDuplicateSpans matches a reference implementation on random corpora") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 3
    val wordsOf: Map[Long, Array[String]] = docs.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array.empty[String] else t.trim.split("\\s+"))
    }.toMap
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, ws) <- wordsOf; i <- 0 to ws.length - k)
      counts(ws.slice(i, i + k).mkString(" ")) += 1
    val expected = docs.map { case (id, _) =>
      val ws = wordsOf(id)
      val covered = Array.fill(ws.length)(false)
      for (i <- 0 to ws.length - k
           if counts(ws.slice(i, i + k).mkString(" ")) >= 2; j <- i until i + k)
        covered(j) = true
      val kept = ws.indices.filterNot(covered).map(ws)
      id -> ((ws.length.toLong, covered.count(identity).toLong, kept.mkString(" ")))
    }.toMap
    val out = Dedup.removeDuplicateSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", spanK = k, minCount = 2L)
      .select("id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == expected)
    assert(expected.values.exists(_._2 > 0), "fixture should remove something")
    assert(expected.values.exists(v => v._1 > 0 && v._2 < v._1),
      "fixture should partially keep at least one doc")
  }

  test("removeDuplicateBlocks is the identity on a duplicate-free corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta"),
      (3L, "theta iota kappa lambda mu")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.removeDuplicateBlocks(docs, "doc_id", "text",
        blockWords = 2, minDf = 2L)
      .select("id", "n_removed", "clean_text").as[(Long, Long, String)].collect()
    assert(out.forall(_._2 == 0L))
    val texts = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, _, clean) => assert(clean == texts(id)) }
  }
}
