package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  *
  * All pure `org.apache.spark.sql.functions` / higher-order-function
  * expressions — no UDFs, so everything stays native Catalyst (codegen or
  * vectorized expression eval), scans stay column-pruned, and the ops
  * distribute trivially: per-row map work with zero shuffles.
  */
object TextAnalysis {

  /** Whitespace tokenization. `split` on a trimmed string; empty text → []. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-pieces + digits + punctuation runs, the
    * usual ~heuristic for LLM token estimation (chars/4 bounded by words).
    */
  def approxBpeTokenCount(text: Column): Column = {
    // pieces: letter runs of <=4 chars count 1; longer words ceil(len/4);
    // digits/punct count per char-run.
    val words = tokens(text)
    aggregate(words, lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))
  }

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = total - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(total === 0, lit(0.0)).otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(toks).cast("double"))
  }

  /** English-ish stopword ratio — a standard quality signal. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was")

  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_intersect(toks, sw)).cast("double") / size(toks).cast("double"))
      // NB array_intersect dedups; ratio of *distinct* stopwords present is a
      // stable signal and cheap. Exact hit-count variant: filter + size.
  }

  /** Exact stopword hit fraction (counts repeats, unlike stopwordRatio). */
  def stopwordHitRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation excess. Deterministic, tunable; the point is the *shape*
    * (pure column expression → free pushdown + codegen).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0)) * 0.4
    val swScore = least(stopwordHitRatio(text) * 4.0, lit(1.0)) * 0.4
    val punctPenalty = least(punctRatio(text) * 2.0, lit(0.2))
    greatest(lit(0.0), lenScore + swScore + lit(0.2) - punctPenalty)
  }

  /** Language-ID by marker-token voting: argmax over per-language stopword
    * hit counts (classic n-gram/profile heuristic, collapsed to tokens).
    * Returns "und" when nothing matches.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "para", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  def langId(text: Column, markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val toks = tokens(lower(text))
    // struct(score, negIdxTieBreak, lang) → array_max picks highest score,
    // ties broken by language code order (deterministic).
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      val sw = array(ws.map(lit): _*)
      struct(size(filter(toks, t => array_contains(sw, t))).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Word k-shingles: sliding k-grams over the token array — the input to
    * MinHash / fingerprinting. Text shorter than k words → single shingle of
    * the whole text.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** Document fingerprint: min-hash over k-shingles (one 64-bit value — the
    * rolling-hash/winnowing family collapsed to its cheapest useful member).
    * Equal fingerprints ⇒ candidate near-dups.
    */
  def docFingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(shingles(text, k), s => xxhash64(s)))

  /** Winnowing fingerprints (Schleimer et al. 2003 — the MOSS scheme):
    * every window of `w` consecutive k-gram hashes contributes its minimal
    * (hash, position) pair, and selected pairs are deduplicated — the
    * guarantee is that any shared substring of >= w+k-1 tokens yields at
    * least one shared fingerprint, at ~2/(w+1) sampling density. Gram
    * hashes are md5-derived (first 15 hex digits, as the fingerprint h15
    * convention elsewhere) so SELECTION ORDER is engine-replayable, unlike
    * xxhash. Docs shorter than w grams contribute their single clipped
    * window. Returns `(id, fp_hash, fp_pos)`.
    *
    * Shape: posexplode grams → one per-doc window pass (partitioned by
    * doc, ~doc-sized sorts) → distinct. One shuffle on the doc id.
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 3, w: Int = 4): DataFrame = {
    require(w > 0, "window must be positive")
    // Fan the (often single-split) corpus out BEFORE the gram explode + md5:
    // the hash storm runs pipelined into the scan task otherwise.
    val grams = Par.fanOut(df.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), posexplode(shingles(col(textCol), k)).as(Seq("pos", "g")))
      .withColumn("h", conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val frame = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("mn", min(struct(col("h"), col("pos"))).over(frame))
      .filter(col("pos") <= col("n") - w || (col("n") < w && col("pos") === 0))
      .select(col("id"), col("mn.h").as("fp_hash"), col("mn.pos").as("fp_pos"))
      .distinct()
  }

  /** MOSS-style overlap detection on top of [[winnowingFingerprints]]:
    * doc pairs sharing >= `minShared` distinct fingerprint HASHES, with the
    * shared count as the overlap score. The inverted fingerprint index
    * self-joins on the hash — the same d²-per-hot-key shape as the shingle
    * pair ops, so `maxFpDf` offers the same hot-key cap (a fingerprint in
    * more than `maxFpDf` docs is corpus boilerplate and is dropped before
    * pairing; below the cap results are identical).
    */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4, minShared: Long = 2L,
                         maxFpDf: Option[Long] = None): DataFrame = {
    val fps = winnowingFingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("fp_hash")).distinct()
    val pruned = maxFpDf.fold(fps) { cap =>
      val hot = fps.groupBy("fp_hash").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("fp_hash")
      fps.join(hot, Seq("fp_hash"), "left_anti")
    }
    pruned.as("a").join(pruned.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** MOSS-style matched SPANS — the report MOSS actually renders: maximal
    * matched token ranges per doc pair, reconstructed from shared
    * `(fp_hash, fp_pos)` fingerprints. Shared anchors on one DIAGONAL
    * (`pos_b - pos_a` constant) belong to one aligned region; anchors ≤
    * `w + k - 1` apart are chained into a run (winnowing guarantees a
    * fingerprint at least every w positions inside a real contiguous
    * match, so a larger gap means the match broke). Each run reports
    * `[start, end]` token spans in BOTH docs plus its anchor count. The
    * md5-derived hashes keep the whole reconstruction SQL-replayable
    * (`dedup_winnow_spans` oracle) — rare for a fingerprinting scheme.
    *
    * Shape: the same hot-key-cappable hash self-join as
    * [[winnowOverlapPairs]], then per-(pair, diagonal) windowed islands —
    * window partitions are per-pair anchor lists (small by construction),
    * never corpus-sized.
    */
  def winnowOverlapSpans(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4, minFps: Long = 2L,
                         maxFpDf: Option[Long] = None): DataFrame = {
    val maxGap = w + k - 1
    val fps = winnowingFingerprints(df, idCol, textCol, k, w)
    val pruned = maxFpDf.fold(fps) { cap =>
      val hot = fps.select(col("id"), col("fp_hash")).distinct()
        .groupBy("fp_hash").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("fp_hash")
      fps.join(hot, Seq("fp_hash"), "left_anti")
    }
    val m = pruned.as("a").join(pruned.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.fp_pos").cast("long").as("pos_a"),
        (col("b.fp_pos") - col("a.fp_pos")).cast("long").as("diag"))
      .distinct()
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    val runs = m
      .withColumn("prev", lag("pos_a", 1).over(wn))
      .withColumn("brk",
        when(col("prev").isNull || col("pos_a") - col("prev") > maxGap, 1)
          .otherwise(0))
      .withColumn("run", sum("brk").over(wn.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
    runs.groupBy("id_a", "id_b", "diag", "run")
      .agg(min("pos_a").as("start_a"), max("pos_a").as("max_pos"),
        count(lit(1)).as("n_fps"))
      .filter(col("n_fps") >= minFps)
      .select(col("id_a"), col("id_b"),
        col("start_a"), (col("max_pos") + (k - 1)).as("end_a"),
        (col("start_a") + col("diag")).as("start_b"),
        (col("max_pos") + (k - 1) + col("diag")).as("end_b"),
        col("n_fps"))
  }

  /** Overlapping token-window chunking — the embedding-ingest step that
    * turns documents into retrieval units. Chunk i starts at
    * `i * (chunkTokens - overlapTokens)`; every doc with text yields
    * `1 + ceil((n - chunkTokens) / stride)` chunks (one when
    * n <= chunkTokens), the last clipped at the doc end, so every token is
    * covered and consecutive chunks share `overlapTokens` tokens. Returns
    * `(id, chunk_id, start_tok, n_tok, chunk_text)`; empty docs yield no
    * chunks.
    *
    * Pure per-row map work (posexplode of a computed slice list) — zero
    * shuffles, so it composes with a downstream embed/write stage at any
    * corpus size.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int = 64, overlapTokens: Int = 16): DataFrame = {
    val stride = chunkTokens - overlapTokens
    require(chunkTokens > 0 && overlapTokens >= 0 && stride > 0,
      s"need chunkTokens > overlapTokens >= 0, got ($chunkTokens, $overlapTokens)")
    val nChunks = when(size(col("__words")) <= chunkTokens, lit(1))
      .otherwise(lit(1) + ceil((size(col("__words")) - chunkTokens)
        .cast("double") / stride).cast("int"))
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__words"))
      .filter(size(col("__words")) > 0)
      .select(col("id"), col("__words"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i =>
          struct((i * stride).cast("long").as("start_tok"),
            slice(col("__words"), i * stride + 1, lit(chunkTokens)).as("toks"))))
          .as(Seq("chunk_id", "c")))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.start_tok"),
        size(col("c.toks")).cast("long").as("n_tok"),
        array_join(col("c.toks"), " ").as("chunk_text"))
  }

  /** Content-defined chunking (LBFS lineage: Muthitacharoen et al., SOSP'01
    * §3.1), word-granular: token position i ends a chunk when the hash of
    * the `windowK`-gram ENDING at i is ≡ 0 (mod `divisor`) — so boundaries
    * depend only on a k-token neighborhood, and an edit perturbs chunking
    * only until the first surviving boundary after it, where everything
    * realigns (the dedup-stability property fixed-stride chunking lacks;
    * spec'd in CdcChunkSpec). `maxChunkTokens` force-splits boundary
    * droughts (forced splits are chunk-start-relative, so they inherit the
    * realignment); E[chunk length] ≈ divisor. No min-length rule: enforcing
    * one is inherently a serial per-doc scan, and the parallel form below
    * is the point — raise `divisor` instead.
    *
    * Shape: the whole construction is array expressions on the token array
    * (boundary scan → natural starts → capped starts → per-chunk slices)
    * followed by one posexplode — a narrow, codegen'd map over documents
    * with ZERO shuffles, the same plan family as [[chunkDocuments]]. The
    * md5-derived gram hash is the [[winnowingFingerprints]] idiom, so the
    * full chunking is SQL-replayable (`pipeline_cdc_chunk` oracle).
    *
    * Returns `(id, chunk_id, start_tok, n_tok, chunk_text, chunk_md5)`;
    * `chunk_md5` is the chunk-level dedup key this chunking exists to
    * stabilize. Empty docs yield no chunks.
    */
  def cdcChunkDocuments(df: DataFrame, idCol: String, textCol: String,
                        windowK: Int = 3, divisor: Int = 32,
                        maxChunkTokens: Int = 128): DataFrame = {
    require(windowK > 0 && divisor > 0 && maxChunkTokens > 0,
      s"need positive (windowK, divisor, maxChunkTokens), got ($windowK, $divisor, $maxChunkTokens)")
    val toks = col("__words")
    val n = size(toks)
    // Boundary positions: grams exist only for windowK-1 <= i <= n-2 (a
    // boundary at the last token is a no-op and is excluded so chunk starts
    // stay < n), hashed as conv(substring(md5(gram), 1, 15), 16, 10) %
    // divisor == 0 — computed by ONE compiled expression
    // ([[graft.functions.CdcBoundaries]], value-identical to the
    // higher-order filter/slice/md5 tree it replaces, which evaluated the
    // md5 chain interpreted per token position and dominated the chunker).
    val bpos = graft.functions.TextExpressions.cdc_boundaries(toks, windowK, divisor)
    // Natural chunk starts {0} ∪ {p+1 : boundary p}, then cap droughts:
    // within [s, e) force starts every maxChunkTokens from s.
    val naturalStarts = concat(array(lit(0)), transform(bpos, p => p + 1))
    val naturalEnds = concat(slice(naturalStarts, lit(2), size(naturalStarts) - 1), array(n))
    val allStarts = flatten(zip_with(naturalStarts, naturalEnds,
      (s, e) => sequence(s, e - 1, lit(maxChunkTokens))))
    val chunks = transform(sequence(lit(0), size(allStarts) - 1), ci => {
      val s = element_at(allStarts, ci + 1)
      val e = when(ci === size(allStarts) - 1, n).otherwise(element_at(allStarts, ci + 2))
      struct(s.cast("long").as("start_tok"), slice(toks, s + 1, e - s).as("toks"))
    })
    // The chunker is a COMPUTE-dense map (an md5 per token position) whose
    // parallelism equals the scan's split count — fan a small/compacted
    // input out to core count (no-op at real scale; 26.9s → 3.9s artifact median
    // at sf0.1 on a single 594 KB input file).
    Par.fanOut(df.select(col(idCol).as("id"), tokens(col(textCol)).as("__words"))
      .filter(size(col("__words")) > 0))
      .select(col("id"), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.start_tok"),
        size(col("c.toks")).cast("long").as("n_tok"),
        array_join(col("c.toks"), " ").as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
  }

  /** Okapi BM25 ranked retrieval over the corpus for a fixed term query —
    * the lexical counterpart of the ANN top-k family. Per doc:
    * `score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))`
    * with the +0.5-smoothed idf `ln((N − df_t + 0.5)/(df_t + 0.5) + 1)`
    * (non-negative, Robertson–Walker–Jones form). Returns the top
    * `topK` docs as `(id, dl, score)` with deterministic
    * (score desc, id) order; scores are `round(…, 6)` so the
    * summation-order ulps don't leak into comparisons (same trade as
    * text_unigram_logprob).
    *
    * Shape: per-term tf via higher-order `filter`/`size` on the token
    * array — NO explode and no shuffle for the tf pass; the corpus stats
    * (N, avgdl, per-term df) are ONE aggregate row broadcast back; the
    * final top-k is a global `orderBy.limit` reduce. The only data-sized
    * exchange is that top-k — the query-side model (term list) is
    * driver-literal, exactly like the ANN operators' query vectors.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], topK: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val withTf = queryTerms.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      d.withColumn(s"__tf_$i",
        size(filter(col("__toks"), x => x === lit(t))).cast("double"))
    }
    val statAggs = sum(col("dl")).as("sum_dl") +: count(lit(1)).cast("double").as("n_docs") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1.0).otherwise(0.0)).as(s"__df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl") / col("n_docs"))
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf_$i")
      val idf = log(((col("n_docs") - col(s"__df_$i") + 0.5) /
        (col(s"__df_$i") + 0.5)) + 1.0)
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored.select(col("id"), col("dl").cast("long").as("dl"),
        round(score, 6).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}
