package graft.queries

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup + text-analysis corpus over the `documents` table (the LLM-pipeline
  * extension ops). Oracle-checked where ANSI-SQL-expressible; the
  * xxhash64-based signatures (MinHash/SimHash/LSH) have no DuckDB equivalent
  * and get rows-only checks, with their *exact-verification* stages (Jaccard,
  * Hamming) oracle-checked through md5-based variants instead.
  */
object TextQueries {
  import Registry.{table => T}

  import org.apache.spark.sql.Column

  /** Per-language marker-hit scores over `text`, in language-code order —
    * shared by `text_langid` and the composite pipeline query so Spark and
    * oracle tie-break identically. */
  private def langScores(text: Column): Seq[(String, Column)] = {
    val toks = TextAnalysis.tokens(lower(text))
    TextAnalysis.LangMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      val sw = array(ws.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(sw, t)))
    }
  }

  /** First language (in code order) achieving the max score; "und" when no
    * marker hits — the exact CASE order mirrored by [[langPredSql]]. */
  private def langPred(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(maxScore <= 0, "und")) { case (acc, (lang, sc)) =>
      acc.when(sc === maxScore, lang)
    }.otherwise("und")
  }

  private def duckToks = "regexp_split_to_array(trim(lower(text)), '\\s+')"

  /** Shared decontamination fixture: the "benchmark" is 15-token extracts
    * of every 50th document (a leaked eval set by construction), so
    * contaminated pairs MUST surface; exact and Bloom-prefiltered paths run
    * the identical extraction + shingle-containment math and share one
    * oracle (Bloom has no false negatives ⇒ identical output).
    */
  private def decontaminate(s: org.apache.spark.sql.SparkSession, dir: String,
                            bloom: Boolean): org.apache.spark.sql.DataFrame = {
    val docs = T(s, dir, "documents")
    val bench = docs
      .filter(col("doc_id") % 50 === 7)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 15)).as("text"))
    val pairs =
      if (bloom) Dedup.decontaminationPairsBloom(docs, bench, "doc_id", "text",
        shingleK = 3, threshold = 0.6)
      else Dedup.decontaminationPairs(docs, bench, "doc_id", "text",
        shingleK = 3, threshold = 0.6)
    pairs.withColumn("contamination", round(col("contamination"), 6))
  }

  private val decontaminateOracle =
    """WITH words AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
      |   ELSE regexp_split_to_array(trim(text), '\s+') END AS w FROM documents),
      | c AS (SELECT doc_id, list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
      |   ELSE list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')) END) AS sh
      |  FROM words),
      | bw AS (SELECT doc_id + 100000 AS bench_id, w[1:15] AS w FROM words WHERE doc_id % 50 = 7),
      | b AS (SELECT bench_id, list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
      |   ELSE list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')) END) AS sh
      |  FROM bw)
      |SELECT c.doc_id AS corpus_id, b.bench_id,
      | round(cast(len(list_intersect(b.sh, c.sh)) as double) / cast(len(b.sh) as double), 6) AS contamination
      |FROM c JOIN b ON len(list_intersect(b.sh, c.sh)) > 0
      |WHERE cast(len(list_intersect(b.sh, c.sh)) as double) / cast(len(b.sh) as double) >= 0.6""".stripMargin

  private def langScoreSqls: Seq[(String, String)] =
    TextAnalysis.LangMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      lang -> (s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE " +
        s"len(list_filter($duckToks, t -> list_contains(${duckList(ws)}, t))) END")
    }

  private def langPredSql: String = {
    val scores = langScoreSqls
    val maxE = s"greatest(${scores.map(_._2).mkString(", ")})"
    s"CASE WHEN $maxE <= 0 THEN 'und' " +
      scores.map { case (l, e) => s"WHEN $e = $maxE THEN '$l'" }.mkString(" ") +
      " ELSE 'und' END"
  }

  /** DuckDB mirror of [[TextAnalysis.qualityScore]] — identical operation
    * tree so the doubles (and thus threshold filters) match bit-for-bit. */
  private def qualityScoreSql: String = {
    val stopHit = "CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE " +
      s"cast(len(list_filter($duckToks, t -> list_contains(${duckList(TextAnalysis.EnglishStopwords)}, t))) as double)" +
      s" / cast(len($duckToks) as double) END"
    val punct = "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
      "cast(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) as double)" +
      " / cast(length(text) as double) END"
    "greatest(0.0, least(cast(length(text) as double) / 500.0, 1.0) * 0.4" +
      s" + least(($stopHit) * 4.0, 1.0) * 0.4 + 0.2 - least(($punct) * 2.0, 0.2))"
  }

  def all: Seq[Q] = Seq(

    // ---- exact dedup: representative + multiplicity per content hash
    Q("dedup_exact",
      (s, dir) => Dedup.exactDuplicates(T(s, dir, "documents"), "doc_id", Seq("text")),
      Some("""SELECT md5(coalesce(cast(text as varchar),'NULL')) AS content_hash,
              | min(doc_id) AS keep_id, count(*) AS n_copies
              |FROM documents GROUP BY 1""".stripMargin)),

    // ---- exact dedup: surviving rows
    Q("dedup_exact_keep",
      (s, dir) => Dedup.dedupExact(T(s, dir, "documents"), "doc_id", Seq("text"))
        .select("doc_id", "lang", "source"),
      Some("""SELECT doc_id, lang, source FROM documents
              |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(coalesce(cast(text as varchar),'NULL')))""".stripMargin)),

    // ---- token counting: whitespace + BPE-ish estimate
    Q("text_token_stats",
      (s, dir) => {
        val d = T(s, dir, "documents")
        d.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.approxBpeTokenCount(col("text")).as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars_actual"))
      },
      Some("""SELECT doc_id,
              | CASE WHEN length(trim(text)) = 0 THEN 0
              |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END::bigint AS n_tokens,
              | CASE WHEN length(trim(text)) = 0 THEN 0
              |      ELSE list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
              |           w -> cast(ceil(length(w) / 4.0) as bigint))) END::bigint AS n_bpe_tokens,
              | length(text)::bigint AS n_chars_actual
              |FROM documents""".stripMargin)),

    // ---- corpus length distribution: EXACT linear-interpolated quantiles
    //      per language (Spark `percentile` ≡ DuckDB `quantile_cont`, both
    //      the type-7 p·(n−1) rule) — the cut points a length-based quality
    //      filter is tuned on. Exact percentile state is a per-group
    //      value→count map, bounded by DISTINCT lengths (≤ ~1e4), so the
    //      "exact" path stays cheap at any corpus size; the t-digest sketch
    //      (`percentile_approx`, the stream/multi-pass scale path) rides
    //      along gated within 5% of the exact median.
    Q("text_length_quantiles",
      (s, dir) => {
        val d = T(s, dir, "documents")
        d.groupBy(col("lang")).agg(
            count(lit(1)).as("n_docs"),
            percentile(col("n_chars"), lit(0.25)).as("p25"),
            percentile(col("n_chars"), lit(0.5)).as("p50"),
            percentile(col("n_chars"), lit(0.9)).as("p90"),
            percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("p50a"))
          .select(col("lang"), col("n_docs"), col("p25"), col("p50"), col("p90"),
            (abs(col("p50a") - col("p50")) <= col("p50") * 0.05).as("approx_ok"))
      },
      Some("""SELECT lang, count(*) AS n_docs,
              | quantile_cont(n_chars, 0.25) AS p25,
              | quantile_cont(n_chars, 0.5) AS p50,
              | quantile_cont(n_chars, 0.9) AS p90,
              | true AS approx_ok
              |FROM documents GROUP BY lang""".stripMargin)),

    // ---- the SCALE path for per-group quantiles: graft's own t-digest
    //      TypedImperativeAggregate (merging digest, Dunning & Ertl) —
    //      O(δ) state per group regardless of group size where the exact
    //      percentile holds the distinct-value histogram. Gate: every
    //      sketch estimate must sit within the STATED rank bound of the
    //      exact distribution — |midrank(est) − q| ≤ 0.02 + 1/n (the
    //      2% sketch bound at δ=200 plus one-row discreteness) — checked
    //      per (lang, q) and folded into counts the oracle pins exactly:
    //      all 3 quantiles of every group must pass. One corpus scan for
    //      the sketches + one for the rank check.
    Q("text_length_quantiles_sketch",
      (s, dir) => {
        import graft.functions.Quantiles
        val qs = Seq(0.25, 0.5, 0.9)
        val d = T(s, dir, "documents")
        val sk = d.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          Quantiles.tdigestQuantiles(col("n_chars"), qs).as("est"))
        val probes = sk.select(col("lang"), col("n_docs"),
            posexplode(col("est")).as(Seq("pos", "v")))
          .withColumn("q", element_at(array(qs.map(lit): _*), col("pos") + 1))
        val ranked = d.select(col("lang"), col("n_chars"))
          .join(broadcast(probes), "lang")
          .groupBy(col("lang"), col("q"), col("v"), col("n_docs"))
          .agg(((sum(when(col("n_chars") < col("v"), 1L).otherwise(0L)) +
                 sum(when(col("n_chars") <= col("v"), 1L).otherwise(0L))) /
                (lit(2.0) * count(lit(1)))).as("midrank"))
        ranked.agg(
          countDistinct(col("lang")).as("n_groups"),
          count(lit(1)).as("n_checks"),
          sum(when(abs(col("midrank") - col("q")) <=
                lit(0.02) + lit(1.0) / col("n_docs"), 1L).otherwise(0L))
            .as("n_within_bound"))
      },
      Some("""SELECT count(DISTINCT lang)::BIGINT AS n_groups,
              | (3 * count(DISTINCT lang))::BIGINT AS n_checks,
              | (3 * count(DISTINCT lang))::BIGINT AS n_within_bound
              |FROM documents""".stripMargin)),

    // ---- quality signals: pure integer-ratio doubles (bit-stable cross-engine)
    Q("text_quality",
      (s, dir) => {
        val d = T(s, dir, "documents")
        d.select(col("doc_id"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.stopwordHitRatio(col("text")).as("stopword_ratio"),
          TextAnalysis.meanTokenLen(col("text")).as("mean_token_len"))
      },
      Some(s"""SELECT doc_id,
               | CASE WHEN length(text) = 0 THEN 0.0
               |   ELSE cast(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) as double) / cast(length(text) as double) END AS punct_ratio,
               | CASE WHEN length(trim(text)) = 0 THEN 0.0
               |   ELSE cast(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
               |        t -> list_contains(${duckList(TextAnalysis.EnglishStopwords)}, t))) as double)
               |        / cast(len(regexp_split_to_array(trim(lower(text)), '\\s+')) as double) END AS stopword_ratio,
               | CASE WHEN length(trim(text)) = 0 THEN 0.0
               |   ELSE cast(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), w -> length(w))) as double)
               |        / cast(len(regexp_split_to_array(trim(text), '\\s+')) as double) END AS mean_token_len
               |FROM documents""".stripMargin)),

    // ---- repetition quality signals (the Gopher-rule family, adapted to
    //      token bigrams since the corpus is single-line): duplicate-bigram
    //      fraction (1 − distinct/total) and top-bigram fraction (most
    //      frequent bigram's share). Shape: explode → (doc, gram) count with
    //      map-side combine → per-doc agg → join back so bigram-less docs
    //      keep zero rows — two bounded shuffles, no per-doc quadratic HOFs.
    Q("text_repetition",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val toks = TextAnalysis.tokens(col("text"))
        // strict bigrams (short docs → null → explode drops; rejoined below)
        val grams = when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", slice(toks, i, lit(2)))))
        val st = docs.select(col("doc_id"), explode(grams).as("gram"))
          .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id").agg(sum("cnt").as("total"),
            count(lit(1)).as("n_distinct"), max("cnt").as("top"))
        docs.select("doc_id").join(st, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("total"), lit(0L)).cast("long").as("n_2grams"),
            round(when(col("total").isNull, 0.0).otherwise(
              lit(1.0) - col("n_distinct").cast("double") / col("total").cast("double")),
              6).as("dup_2gram_frac"),
            round(when(col("total").isNull, 0.0).otherwise(
              col("top").cast("double") / col("total").cast("double")),
              6).as("top_2gram_frac"))
      },
      Some("""WITH words AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |   ELSE regexp_split_to_array(trim(text), '\s+') END AS w FROM documents),
              | g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
              |   i -> array_to_string(w[i:i+1], ' '))) AS gram FROM words WHERE len(w) >= 2),
              | c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
              | s AS (SELECT doc_id, sum(cnt) AS total, count(*) AS n_distinct, max(cnt) AS top
              |  FROM c GROUP BY 1)
              |SELECT w.doc_id, coalesce(total, 0)::bigint AS n_2grams,
              | round(CASE WHEN total IS NULL THEN 0.0
              |   ELSE 1.0 - cast(n_distinct as double) / cast(total as double) END, 6) AS dup_2gram_frac,
              | round(CASE WHEN total IS NULL THEN 0.0
              |   ELSE cast(top as double) / cast(total as double) END, 6) AS top_2gram_frac
              |FROM words w LEFT JOIN s USING (doc_id)""".stripMargin)),

    // ---- language-ID by marker voting, explicit CASE tie-break in both engines
    Q("text_langid",
      (s, dir) => {
        val d = T(s, dir, "documents")
        val toks = TextAnalysis.tokens(lower(col("text")))
        val scores = TextAnalysis.LangMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
          val sw = array(ws.map(lit): _*)
          lang -> size(filter(toks, t => array_contains(sw, t)))
        }
        val maxScore = greatest(scores.map(_._2): _*)
        // first language (in code order) achieving the max — same CASE order
        // as the oracle below
        val pred = scores.foldLeft(when(maxScore <= 0, "und")) { case (acc, (lang, sc)) =>
          acc.when(sc === maxScore, lang)
        }.otherwise("und")
        d.select(col("doc_id") +: pred.as("lang_pred") +:
          scores.map { case (l, sc) => sc.cast("long").as(s"score_$l") }: _*)
      },
      Some {
        val langs = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
        val toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
        val scoreExprs = langs.map { case (lang, ws) =>
          s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(list_filter($toks, t -> list_contains(${duckList(ws)}, t))) END"
        }
        val scoreCols = langs.zip(scoreExprs).map { case ((l, _), e) => s"$e::bigint AS score_$l" }
        val maxE = s"greatest(${scoreExprs.mkString(", ")})"
        val caseE = langs.zip(scoreExprs).map { case ((l, _), e) => s"WHEN $e = m THEN '$l'" }
        s"""SELECT doc_id,
           | CASE WHEN m <= 0 THEN 'und' ${caseE.mkString(" ")} ELSE 'und' END AS lang_pred,
           | ${scoreCols.mkString(", ")}
           |FROM (SELECT doc_id, text, $maxE AS m FROM documents)""".stripMargin
      }),

    // ---- document fingerprint: min-md5 over 5-word shingles (oracle-able
    //      md5 variant of TextAnalysis.docFingerprint)
    Q("text_fingerprint",
      (s, dir) => {
        val d = T(s, dir, "documents")
        d.select(col("doc_id"),
          array_min(transform(TextAnalysis.shingles(col("text"), 5), x => md5(x))).as("min_shingle_md5"))
      },
      Some("""SELECT doc_id,
              | CASE WHEN len(words) <= 5 THEN md5(array_to_string(words, ' '))
              |   ELSE list_min(list_transform(range(1, len(words) - 3),
              |        i -> md5(array_to_string(words[i:i+4], ' ')))) END AS min_shingle_md5
              |FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |      ELSE regexp_split_to_array(trim(text), '\s+') END AS words FROM documents)""".stripMargin)),

    // ---- corpus vocabulary: top-k tokens by frequency (the build-a-vocab /
    //      frequency-table primitive). One explode → hash-agg (map-side
    //      combine on the token key) → TakeOrdered; total (count desc,
    //      token asc) ordering makes the top-k unique, so the oracle can
    //      hash it. At 100 TB the agg output is vocabulary-sized (≪ corpus)
    //      and only k rows cross the final ordering.
    Q("text_vocab_topk",
      (s, dir) => T(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100),
      Some("""SELECT token, count(*) AS n
              |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
              |      FROM documents WHERE length(trim(text)) > 0)
              |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin)),

    // ---- PII detection + scrubbing: the redaction pass a training-data
    //      pipeline runs before release. PII is PLANTED deterministically
    //      (an email on every 10th doc, an E.164-ish phone on every 15th) so
    //      the scrub provably fires at every SF; both engines replay the
    //      identical planting, the same RE2/Java-compatible patterns (no
    //      lookaround), and the same replace order — counts and the
    //      post-scrub text hash are all oracle-checked. Zero shuffle,
    //      codegen'd regex per row.
    Q("text_pii_scrub",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "\\+[0-9]{8,}"
        val t = concat(col("text"),
          when(col("doc_id") % 10 === 0,
            concat(lit(" contact: user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 15 === 0,
            concat(lit(" tel: +14155550"), col("doc_id")))
            .otherwise(lit("")))
        T(s, dir, "documents").select(col("doc_id"),
          regexp_count(t, lit(email)).cast("long").as("n_emails"),
          regexp_count(t, lit(phone)).cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(t, email, "[EMAIL]"),
            phone, "[PHONE]")).as("scrubbed_md5"))
      },
      Some("""WITH p AS (SELECT doc_id, text
              |  || CASE WHEN doc_id % 10 = 0 THEN ' contact: user' || doc_id || '@example.com' ELSE '' END
              |  || CASE WHEN doc_id % 15 = 0 THEN ' tel: +14155550' || doc_id ELSE '' END AS t
              | FROM documents)
              |SELECT doc_id,
              | len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::bigint AS n_emails,
              | len(regexp_extract_all(t, '\+[0-9]{8,}'))::bigint AS n_phones,
              | md5(regexp_replace(regexp_replace(t,
              |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              |   '\+[0-9]{8,}', '[PHONE]', 'g')) AS scrubbed_md5
              |FROM p""".stripMargin)),

    // ---- MinHash + LSH near-dup pairs, precision/recall-gated (the knn
    //      recall-gate pattern): DuckDB can't replay the xxhash64
    //      signatures, but it CAN count the exact-jaccard pairs the LSH
    //      stage must recover. precision_ok is structural (candidates are
    //      verified by exact jaccard, so found ⊆ exact — a verify bug
    //      hash-fails); recall_ok floors found/exact at 0.8 (32 hashes ×
    //      16 bands ⇒ ≥94% candidate probability at j=0.4, ~100% for the
    //      planted near-dups; measured 1.0 at sf0.001/0.01/0.1).
    Q("dedup_minhash_pairs",
      (s, dir) => {
        // Shingling is the shared per-row hot loop of BOTH the operator
        // (signature + verify sides) and the exact-jaccard baseline the
        // gate compares against — compute it ONCE (same owner-releases
        // pattern as minhashNearDups itself; the tiny gate row is
        // checkpointed before the finally releases the corpus-sized frame).
        val shingled = graft.ops.Par.fanOut(T(s, dir, "documents")
            .select(col("doc_id").as("id"), col("text").as("__text")))
          .select(col("id"),
            array_distinct(TextAnalysis.shingles(col("__text"), 3)).as("sh"))
          .localCheckpoint(true)
        try {
          // The operator: minhash signatures → banded buckets → candidate
          // pairs → exact-jaccard verify (identical stages to
          // Dedup.minhashNearDups, built from its public primitives).
          val sigged = shingled.select(col("id"),
            Dedup.minhashSignatureOfShingles(col("sh"), 32).as("sig"))
          val buckets = Dedup.lshBuckets(sigged, "id", "sig", numHashes = 32, bands = 16)
          val cands = buckets.as("a").join(buckets.as("b"),
              col("a.band_id") === col("b.band_id") &&
              col("a.band_hash") === col("b.band_hash") && col("a.id") < col("b.id"))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
          val found = cands
            .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
            .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
            .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
            .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
            .select(col("id_a"), col("id_b"),
              when(col("uni") === 0, lit(1.0))
                .otherwise(col("inter").cast("double") / col("uni").cast("double"))
                .as("jaccard"))
            .filter(col("jaccard") >= 0.4)
            .select("id_a", "id_b")
          // The exact baseline: inverted index over hashed shingles from the
          // SAME frame (shuffle key stays a long at corpus scale).
          val inv = shingled.select(col("id"), size(col("sh")).as("sz"),
            explode(transform(col("sh"), x => xxhash64(x))).as("g"))
          val exact = inv.as("a").join(inv.as("b"),
              col("a.g") === col("b.g") && col("a.id") < col("b.id"))
            .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
            .agg(count(lit(1)).as("inter"))
            .select(col("id_a"), col("id_b"),
              (col("inter").cast("double") /
                (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"))
            .filter(col("jaccard") >= 0.4)
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
            .localCheckpoint(true)
        } finally graft.ops.Caching.release(shingled)
      },
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents))
              |SELECT count(*)::bigint AS n_exact, true AS precision_ok, true AS recall_ok
              |FROM d a JOIN d b ON a.doc_id < b.doc_id
              |WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
              |   cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double) >= 0.4""".stripMargin)),

    // ---- SimHash near-dup candidates, clone-gated: plant an exact clone
    //      of every 25th document — identical text MUST produce an
    //      identical simhash (hamming 0) and the 16-bit-piece banding MUST
    //      surface the pair, deterministically. A signature/banding/verify
    //      bug loses clones and hash-fails; the oracle pins the planted
    //      count. (Semantic near-miss recall is asserted in OpsSpec — one
    //      changed token flips only low-margin bits.)
    Q("dedup_simhash",
      (s, dir) => {
        val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
        val clones = docs.filter(col("doc_id") % 25 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val pairs = Dedup.simhashNearDups(docs.unionByName(clones),
          "doc_id", "text", maxHamming = 3)
        val cloneHits = pairs
          .filter(col("id_b") === col("id_a") + 1000000L && col("hamming") === 0)
          .select("id_a").distinct()
          .agg(count(lit(1)).as("clones_found"))
        // id_space_ok guards the +1e6 clone-id convention: a corpus with
        // doc_ids >= 1e6 could collide planted ids with real ones (or count
        // a natural identical pair at exactly +1e6 as a clone) — the gate
        // would then pass/fail for the wrong reason. Oracle pins `true`, so
        // an id-space violation hash-fails loudly instead of silently.
        docs.agg(
            count(when(col("doc_id") % 25 === 3, lit(1))).as("n_planted"),
            (max(col("doc_id")) < 1000000L).as("id_space_ok"))
          .crossJoin(cloneHits)
          .select(col("n_planted"), col("clones_found"),
            (col("clones_found") === col("n_planted")).as("all_found"),
            col("id_space_ok"))
      },
      Some("""SELECT count(CASE WHEN doc_id % 25 = 3 THEN 1 END)::bigint AS n_planted,
              | count(CASE WHEN doc_id % 25 = 3 THEN 1 END)::bigint AS clones_found,
              | true AS all_found, true AS id_space_ok
              |FROM documents""".stripMargin)),

    // ---- exact n-gram Jaccard, full corpus — oracle-checked
    Q("dedup_jaccard_exact",
      (s, dir) => {
        // Full corpus (the planted near-dups sit at high doc ids, so an
        // id-range scope silently tests the empty set) through the inverted
        // shingle index — exact values, co-occurring pairs only.
        val docs = T(s, dir, "documents")
        Dedup.jaccardPairsInverted(docs, "doc_id", "text", shingleK = 3, threshold = 0.05)
          .withColumn("jaccard", round(col("jaccard"), 6))
      },
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents))
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              | round(cast(len(list_intersect(a.sh, b.sh)) as double) /
              |   cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double), 6) AS jaccard
              |FROM d a JOIN d b ON a.doc_id < b.doc_id
              |WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
              |   cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double) >= 0.05""".stripMargin)),

    // ---- hot-shingle df-cap variant of the inverted index — the 100 TB
    //      production shape: shingles with document frequency > 20 are
    //      dropped from the index BEFORE the self-join (a shingle shared by
    //      d docs contributes d² join rows; boilerplate in 10⁶ docs is
    //      10¹² rows without the cap). The oracle replays the identical
    //      cap semantics in SQL, so the bound itself is hash-gated, not
    //      just spec'd.
    Q("dedup_jaccard_capped",
      (s, dir) => Dedup.jaccardPairsInverted(
          T(s, dir, "documents"), "doc_id", "text", shingleK = 3,
          threshold = 0.05, maxShingleDf = Some(20L))
        .withColumn("jaccard", round(col("jaccard"), 6)),
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM d),
              | hot AS (SELECT g FROM inv GROUP BY g HAVING count(*) > 20),
              | kept AS (SELECT * FROM inv WHERE g NOT IN (SELECT g FROM hot)),
              | co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |         a.sz AS sz_a, b.sz AS sz_b, count(*) AS inter
              |        FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
              |        GROUP BY 1, 2, 3, 4)
              |SELECT id_a, id_b,
              | round(cast(inter as double) / cast(sz_a + sz_b - inter as double), 6) AS jaccard
              |FROM co
              |WHERE cast(inter as double) / cast(sz_a + sz_b - inter as double) >= 0.05""".stripMargin)),

    // ---- exact containment (overlap coefficient |A∩B|/|A|) — the
    //      asymmetric near-dup measure for quote/subset detection, where
    //      jaccard is diluted by the containing document's size
    Q("dedup_containment",
      (s, dir) => Dedup.containmentPairsInverted(
          T(s, dir, "documents"), "doc_id", "text", shingleK = 3, threshold = 0.2)
        .withColumn("containment", round(col("containment"), 6)),
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents))
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              | round(cast(len(list_intersect(a.sh, b.sh)) as double) / cast(len(a.sh) as double), 6) AS containment
              |FROM d a JOIN d b ON a.doc_id <> b.doc_id
              |WHERE len(list_intersect(a.sh, b.sh)) > 0
              |  AND cast(len(list_intersect(a.sh, b.sh)) as double) / cast(len(a.sh) as double) >= 0.2""".stripMargin)),

    // ---- composite training-data pipeline: quality-filter → language-filter
    //      → exact-dedup → per-source stats, end to end in one declarative
    //      plan (scan → map-side filters → one dedup shuffle → one agg
    //      shuffle). The quality/lang thresholds run as identical IEEE
    //      operation trees in both engines, so the boundary filter is exact.
    Q("pipeline_clean_corpus",
      (s, dir) => {
        val d = graft.ops.Par.fanOut(T(s, dir, "documents"))
        // Score ONCE into a materialized stats struct (eager localCheckpoint
        // so the dedup self-join and every derived column read materialized
        // values): all per-row statistics come from the single compiled
        // TokenTextStats pass — the interpreted per-language HOF filters it
        // replaces dominated this query (14.8 s at sf0.1).
        val langs = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
        val base = d.select(col("doc_id"), col("source"), col("text"),
            graft.functions.TextExpressions.token_text_stats(col("text"),
              langs, TextAnalysis.EnglishStopwords).as("__st"))
          .localCheckpoint(true)
        try {
          // Rebuild q / lang_pred from the materialized counts with the
          // SAME double operation tree as TextAnalysis.qualityScore /
          // langPred — bit-identical to the oracle's replay.
          val st = col("__st")
          val nChars = st.getField("n_chars")
          val nToks = st.getField("n_tokens")
          val swHit = when(nToks === 0, lit(0.0))
            .otherwise(st.getField("stop_hits").cast("double") / nToks.cast("double"))
          val punctR = when(nChars === 0, lit(0.0))
            .otherwise(st.getField("punct_chars").cast("double") / nChars.cast("double"))
          val q = greatest(lit(0.0),
            least(nChars.cast("double") / 500.0, lit(1.0)) * 0.4 +
              least(swHit * 4.0, lit(1.0)) * 0.4 + lit(0.2) -
              least(punctR * 2.0, lit(0.2)))
          val scores = langs.zipWithIndex.map { case ((l, _), i) =>
            l -> element_at(st.getField("lang_hits"), i + 1)
          }
          val kept = base
            .withColumn("n_tokens", nToks.cast("long"))
            .withColumn("q", q)
            .withColumn("lang_pred", langPred(scores))
            .filter(col("q") >= 0.5 && col("lang_pred") === "en")
          // Materialize the tiny per-source aggregate eagerly so the
          // corpus-sized stats checkpoint can be released before returning
          // (unreleased, its blocks pinned executor memory for the rest of
          // the session — a measured whole-bench slowdown).
          Dedup.dedupExact(kept, "doc_id", Seq("text"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
            .localCheckpoint(true)
        } finally graft.ops.Caching.release(base)
      },
      Some(s"""WITH scored AS (SELECT doc_id, source, text,
               |   CASE WHEN length(trim(text)) = 0 THEN 0
               |        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::bigint AS n_tokens,
               |   $qualityScoreSql AS q, $langPredSql AS lang_pred
               |  FROM documents),
               | kept AS (SELECT * FROM scored WHERE q >= 0.5 AND lang_pred = 'en'),
               | dedup AS (SELECT * FROM kept WHERE doc_id IN (
               |    SELECT min(doc_id) FROM kept GROUP BY md5(coalesce(cast(text as varchar),'NULL'))))
               |SELECT source, count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS total_tokens
               |FROM dedup GROUP BY source""".stripMargin)),

    // ---- benchmark decontamination: the n-gram-overlap test-set leak
    //      check. The "benchmark" is built deterministically as 15-token
    //      extracts of every 50th document (a leaked eval set by
    //      construction), so contaminated pairs MUST surface; both engines
    //      replay the identical extraction + shingle-containment math.
    Q("pipeline_decontaminate",
      (s, dir) => decontaminate(s, dir, bloom = false),
      Some(decontaminateOracle)),

    // ---- the SAME decontamination check through the Bloom pre-filter (the
    //      100 TB shape: one eval-set-sized filter screens the corpus
    //      map-side with zero shuffle; only flagged docs reach the exact
    //      inverted-index join). Bloom has no false negatives, so the
    //      result must be BYTE-IDENTICAL to the exact operator — same
    //      oracle, full hash gate.
    Q("pipeline_decontaminate_bloom",
      (s, dir) => decontaminate(s, dir, bloom = true),
      Some(decontaminateOracle)),

    // ---- sequence packing: concatenate each source's docs (doc_id order)
    //      into a token stream, chunk at 512 — per-chunk doc counts and
    //      fill. Every chunk but each shard's tail must fill to exactly 512
    //      (the oracle checks the values, not just the shape).
    Q("pipeline_pack_sequences",
      (s, dir) => {
        val d = T(s, dir, "documents").select(col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.ops.Packing.chunkStats(d, "doc_id", "n_tokens",
          seqLen = 512, shardCol = Some("source"))
      },
      Some("""WITH t AS (SELECT source, doc_id,
              |   CASE WHEN length(trim(text)) = 0 THEN 0
              |        ELSE len(regexp_split_to_array(trim(text), '\s+')) END::bigint AS n
              |  FROM documents),
              | o AS (SELECT source, doc_id, n,
              |   cast(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS off
              |  FROM t),
              | e AS (SELECT source, n, off,
              |   unnest(range(off // 512, (off + n - 1) // 512 + 1)) AS chunk_id
              |  FROM o WHERE n > 0)
              |SELECT source, chunk_id, count(*) AS n_docs,
              | cast(sum(least(off + n, (chunk_id + 1) * 512) - greatest(off, chunk_id * 512)) as bigint) AS n_tokens
              |FROM e GROUP BY source, chunk_id""".stripMargin)),

    // ---- per-source token budgets: take each source's docs in doc_id
    //      order until a token budget fills — the budget-capped side of
    //      data mixing (domain caps in tokens, not keep-rates). One window
    //      cumsum per source partition, filter pushes nothing downstream;
    //      at scale the window shuffles once on the (bounded) source key.
    Q("pipeline_token_budget",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        T(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .filter(col("cum") <= 8000L)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      },
      Some("""WITH t AS (SELECT source, doc_id,
              |   CASE WHEN length(trim(text)) = 0 THEN 0
              |        ELSE len(regexp_split_to_array(trim(text), '\s+')) END::bigint AS n
              |  FROM documents),
              | o AS (SELECT source, n,
              |   sum(n) OVER (PARTITION BY source ORDER BY doc_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM t)
              |SELECT source, count(*) AS n_docs, cast(sum(n) as bigint) AS total_tokens
              |FROM o WHERE cum <= 8000 GROUP BY source""".stripMargin)),

    // ---- deterministic data mixing: per-source keep rates over an
    //      md5-bucket of doc_id — the reweight-by-source primitive, as one
    //      pushed-down filter (no RNG, no shuffle, reproducible anywhere).
    Q("pipeline_mix_sample",
      (s, dir) => graft.ops.Sampling.mixSources(T(s, dir, "documents"),
          "doc_id", "source",
          rates = Map("src0" -> 0.8, "src1" -> 0.2, "src2" -> 0.5),
          defaultRate = 0.35)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars")),
      Some("""SELECT source, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_chars
              |FROM (SELECT *, ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000 AS b
              |      FROM documents)
              |WHERE b < CASE source WHEN 'src0' THEN 8000 WHEN 'src1' THEN 2000
              |                      WHEN 'src2' THEN 5000 ELSE 3500 END
              |GROUP BY source""".stripMargin)),

    // ---- TEMPERATURE mixing (target proportions ∝ n_s^α — the
    //      multilingual-sampling rule): keep rates derive from the corpus's
    //      own per-source counts, r_s ∝ n_s^(α−1) normalized so the
    //      smallest source keeps everything; α=0.5 here, computed via
    //      exact-rounded sqrt so the rate arithmetic itself is replayed
    //      bit-for-bit (counts → sqrt → ÷ → ×10⁴ → round, identical IEEE
    //      tree both engines). One grouped count (collected, ∝ #sources) +
    //      the same pushed-down md5-bucket filter as pipeline_mix_sample;
    //      the computed basis-point rate rides the output as its own
    //      hash-gated column.
    Q("pipeline_mix_temperature",
      (s, dir) => {
        val (mixed, bps) = graft.ops.Sampling.mixByTemperature(
          T(s, dir, "documents"), "doc_id", "source", alpha = 0.5)
        mixed.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .withColumn("rate_bps",
            graft.ops.Sampling.rateColOf(bps, "source").cast("long"))
      },
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
              | m AS (SELECT min(n) AS nmin FROM c),
              | r AS (SELECT source,
              |   CAST(round(10000 * sqrt(CAST(nmin AS double) / n)) AS BIGINT) AS rate_bps
              |  FROM c, m)
              |SELECT d.source, count(*) AS n_docs,
              | cast(sum(d.n_chars) as bigint) AS total_chars, r.rate_bps
              |FROM documents d JOIN r ON d.source = r.source
              |WHERE ('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::bigint % 10000
              |      < r.rate_bps
              |GROUP BY d.source, r.rate_bps""".stripMargin)),

    // ---- PMI collocations (pointwise mutual information over corpus
    //      bigrams): the phrase-mining signal — ln(p(ab) / (p(a)·p(b))),
    //      min-count floored, top-k by PMI. Corpus-wide unigram + bigram
    //      counts are two map-side-combined aggregates; the vocab-sized
    //      unigram table joins back onto bigram rows (broadcast at any
    //      corpus scale — vocab ≪ corpus); the two scalar totals reach the
    //      driver. PMI is rounded to 6 places in the identical IEEE tree
    //      both engines replay (the unigram-LM precedent), and the top-k
    //      order is totalized by the gram tiebreak.
    Q("text_collocations",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val toks = graft.ops.TextAnalysis.tokens(lower(col("text")))
        val words = docs.select(explode(toks).as("w"))
        // Materialize both vocab-sized count tables ONCE (eager local
        // checkpoint): the scalar totals and the join-back below would each
        // re-run the corpus tokenize/explode otherwise — 6 corpus passes
        // instead of 2.
        val uni = words.groupBy("w").agg(count(lit(1)).as("cw"))
          .localCheckpoint(true)
        val n1 = uni.agg(sum("cw")).head().getLong(0).toDouble
        // Adjacent pairs via slice+arrays_zip (plain collection expressions,
        // fully codegen'd — the transform(sequence…) lambda form is
        // interpreted and was ~2× slower); the gram STRING is only built on
        // the vocab-sized aggregate below, never per corpus token.
        val pairs = when(size(toks) >= 2,
          arrays_zip(slice(toks, lit(1), size(toks) - 1).as("a"),
            slice(toks, lit(2), size(toks) - 1).as("b")))
        val big = docs.select(explode(pairs).as("p"))
          .select(col("p.a").as("w1"), col("p.b").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n_pairs"))
          .localCheckpoint(true)
        val n2 = big.agg(sum("n_pairs")).head().getLong(0).toDouble
        val u1 = uni.select(col("w").as("w1"), col("cw").as("c1"))
        val u2 = uni.select(col("w").as("w2"), col("cw").as("c2"))
        big.filter(col("n_pairs") >= 5)
          .withColumn("gram", concat_ws(" ", col("w1"), col("w2")))
          .join(broadcast(u1), Seq("w1")).join(broadcast(u2), Seq("w2"))
          .select(col("gram"), col("n_pairs"),
            round(log((col("n_pairs").cast("double") / lit(n2)) /
              ((col("c1").cast("double") / lit(n1)) *
                (col("c2").cast("double") / lit(n1)))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("gram"))
          .limit(50)
      },
      Some("""WITH words AS (SELECT CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w FROM documents),
              | uni AS (SELECT w2 AS w, count(*) AS cw
              |  FROM (SELECT unnest(w) AS w2 FROM words) GROUP BY 1),
              | n1 AS (SELECT CAST(sum(cw) AS double) AS n FROM uni),
              | big AS (SELECT gram, count(*) AS n_pairs
              |  FROM (SELECT unnest(list_transform(range(1, len(w)),
              |    i -> array_to_string(w[i:i+1], ' '))) AS gram FROM words WHERE len(w) >= 2)
              |  GROUP BY gram),
              | n2 AS (SELECT CAST(sum(n_pairs) AS double) AS n FROM big)
              |SELECT gram, n_pairs,
              | round(ln((CAST(n_pairs AS double) / n2.n) /
              |   ((CAST(u1.cw AS double) / n1.n) * (CAST(u2.cw AS double) / n1.n))), 6) AS pmi
              |FROM big
              |CROSS JOIN n1 CROSS JOIN n2
              |JOIN uni u1 ON u1.w = string_split(gram, ' ')[1]
              |JOIN uni u2 ON u2.w = string_split(gram, ' ')[2]
              |WHERE n_pairs >= 5
              |ORDER BY pmi DESC, gram LIMIT 50""".stripMargin)),

    // ---- the full near-dup dedup pipeline, end to end and EXACT: shingle
    //      jaccard pairs (inverted index, HOT SHINGLES CAPPED at df>20 —
    //      without the cap one boilerplate shingle shared by d documents
    //      costs d²/2 join rows, the quadratic scale-killer the cap exists
    //      for; set sizes stay exact, so scores are lower bounds) →
    //      connected components → keep the canonical (min-id) doc per
    //      cluster → cleaned-corpus stats. The oracle replays every stage
    //      in SQL — the SAME hot-posting drop, then recursive transitive
    //      closure over the identical pair list — so cluster assignment and
    //      the final kept set are both checked, not just pair discovery.
    Q("pipeline_dedup_corpus",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val pairs = graft.ops.Dedup
          .jaccardPairsInverted(docs, "doc_id", "text", shingleK = 3,
            threshold = 0.05, maxShingleDf = Some(20L))
          .select("id_a", "id_b")
        val losers = graft.ops.Cluster.dedupClusters(pairs)
          .filter(!col("is_keep")).select(col("id").as("doc_id"))
        docs.join(losers, Seq("doc_id"), "left_anti")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      },
      Some("""WITH RECURSIVE d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM d),
              | hot AS (SELECT g FROM inv GROUP BY g HAVING count(*) > 20),
              | kept AS (SELECT * FROM inv WHERE g NOT IN (SELECT g FROM hot)),
              | e AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
              |  HAVING cast(count(*) as double) /
              |    cast(a.sz + b.sz - count(*) as double) >= 0.05),
              | und AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
              | reach(id, r) AS (
              |  SELECT u, u FROM und
              |  UNION
              |  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.id),
              | losers AS (SELECT id FROM reach GROUP BY id HAVING id <> min(r))
              |SELECT lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_chars
              |FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
              |GROUP BY lang""".stripMargin)),

    // ---- INCREMENTAL near-dup detection: a 10% "ingest batch" (doc_id %
    //      10 = 7) is checked against the remaining 90% corpus and itself
    //      via the asymmetric LSH probe (new buckets × full index) — the
    //      recurring-ingest dedup loop, where each batch pays work ∝ its
    //      own size, never corpus². Gated exactly like dedup_minhash_pairs:
    //      precision structural (pairs are exact-verified), recall floored
    //      at 0.8 of the oracle-counted exact pair set involving the batch.
    Q("dedup_minhash_incremental",
      (s, dir) => {
        val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
        val incoming = docs.filter(col("doc_id") % 10 === 7)
        val base = docs.filter(col("doc_id") % 10 =!= 7)
        val found = Dedup.incrementalNearDups(base, incoming, "doc_id", "text",
            shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
            maxBucketSize = Some(1000L))
          .select("id_a", "id_b")
        // Exact baseline: inverted-index pairs restricted to those touching
        // the ingest batch (same restriction the oracle applies).
        val shingled = graft.ops.Par.fanOut(
            docs.select(col("doc_id").as("id"), col("text").as("__text")))
          .select(col("id"),
            array_distinct(TextAnalysis.shingles(col("__text"), 3)).as("sh"))
          .localCheckpoint(true)
        try {
          val inv = shingled.select(col("id"), size(col("sh")).as("sz"),
            explode(transform(col("sh"), x => xxhash64(x))).as("g"))
          val exact = inv.as("a").join(inv.as("b"),
              col("a.g") === col("b.g") && col("a.id") < col("b.id"))
            .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
            .agg(count(lit(1)).as("inter"))
            .select(col("id_a"), col("id_b"),
              (col("inter").cast("double") /
                (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"))
            .filter(col("jaccard") >= 0.4)
            .filter(col("id_a") % 10 === 7 || col("id_b") % 10 === 7)
            .select("id_a", "id_b")
          val tp = found.join(exact, Seq("id_a", "id_b"), "left_semi")
            .agg(count(lit(1)).as("tp"))
          val fp = found.join(exact, Seq("id_a", "id_b"), "left_anti")
            .agg(count(lit(1)).as("fp"))
          val gate = exact.agg(count(lit(1)).as("n_exact")).crossJoin(tp).crossJoin(fp)
            .select(col("n_exact"),
              (col("fp") === 0).as("precision_ok"),
              (col("tp").cast("double") >=
                col("n_exact").cast("double") * 0.8).as("recall_ok"))
            .localCheckpoint(true)
          graft.ops.Caching.release(found)
          gate
        } finally graft.ops.Caching.release(shingled)
      },
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents))
              |SELECT count(*)::bigint AS n_exact, true AS precision_ok, true AS recall_ok
              |FROM d a JOIN d b ON a.doc_id < b.doc_id
              |WHERE (a.doc_id % 10 = 7 OR b.doc_id % 10 = 7)
              | AND cast(len(list_intersect(a.sh, b.sh)) as double) /
              |   cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double) >= 0.4""".stripMargin)),

    // ---- cumulative multi-batch ingest: three sequential ingests
    //      partition the corpus (batch i arrives with batches < i already
    //      indexed), and the UNION of per-ingest incremental probes must
    //      recover the full-corpus pair set — every pair surfaces exactly
    //      once, in the ingest where its later-arriving member lands. This
    //      is the completeness property that makes the recurring-ingest
    //      loop sound: no pair is ever permanently missed by arriving in
    //      pieces. Gated like dedup_minhash_pairs: precision structural
    //      (exact-verified pairs), recall floored at 0.8 of the
    //      oracle-counted full exact pair set (measured 1.0).
    Q("pipeline_incremental_ingest",
      (s, dir) => {
        val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
        val rounds = (0 until 3).map { i =>
          val base = docs.filter(pmod(col("doc_id"), lit(3)) < i)
          val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === i)
          Dedup.incrementalNearDups(base, incoming, "doc_id", "text",
              shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
              maxBucketSize = Some(1000L))
            .select("id_a", "id_b")
        }
        val found = rounds.reduce(_ unionByName _)
        val gate = incrementalRecallGate(s, dir, found)
        rounds.foreach(graft.ops.Caching.release)
        gate
      },
      Some(incrementalIngestOracle)),

    // Same recurring-ingest fixture, but through
    // [[graft.ops.DurableMinHashIndex]]: the band-bucket index and shingle
    // store PERSIST under a stateDir between rounds, and each round
    // constructs a FRESH index instance — every round is a restarted
    // process probing the on-disk index, never handed the base corpus.
    // Same exact-Jaccard ground truth and precision/recall gate as
    // pipeline_incremental_ingest.
    Q("pipeline_incremental_ingest_durable",
      (s, dir) => {
        val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
        val state = java.nio.file.Files.createTempDirectory("graft_dedup_state").toString
        val rounds = (0 until 3).map { i =>
          val idx = new graft.ops.DurableMinHashIndex(s, state,
            shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
            maxBucketSize = Some(1000L))
          idx.ingest(docs.filter(pmod(col("doc_id"), lit(3)) === i), "doc_id", "text")
            .select("id_a", "id_b")
        }
        val found = rounds.reduce(_ unionByName _)
        val gate = incrementalRecallGate(s, dir, found)
        rounds.foreach(graft.ops.Caching.release)
        gate
      },
      Some(incrementalIngestOracle)),

    // Same durable-ingest machinery with [[graft.ops.DurableMinHashIndex.compact]]
    // run between the rounds: the second restarted probe reads the
    // rewritten (deduplicated, orphan-dropped, one-file-per-bucket) stores,
    // so the oracle gate — exact truth, same construction as the
    // uncompacted variant — proves compaction changes no probe result
    // while keeping the append-only state maintainable for a
    // recurring-ingest loop. The fixture is deliberately lean: one
    // compact-then-restarted-probe round trip IS the property under test,
    // so two batches over the even-id half-corpus suffice (pair
    // completeness holds for any disjoint split; the gate's ground truth
    // filters down from the cached full pair set), and no trailing
    // compact runs — nothing would probe it.
    Q("pipeline_ingest_compact",
      (s, dir) => {
        val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
          .filter(pmod(col("doc_id"), lit(2)) === 0)
        val state = java.nio.file.Files.createTempDirectory("graft_dedup_cmp").toString
        val rounds = (0 until 2).map { i =>
          val idx = new graft.ops.DurableMinHashIndex(s, state,
            shingleK = 3, numHashes = 32, bands = 16, threshold = 0.4,
            maxBucketSize = Some(1000L))
          val out = idx.ingest(
            docs.filter(pmod(col("doc_id"), lit(4)) === i * 2), "doc_id", "text")
            .select("id_a", "id_b")
          if (i == 0) idx.compact() // results above are checkpointed; stores swap safely
          out
        }
        val found = rounds.reduce(_ unionByName _)
        val gate = incrementalRecallGate(s, dir, found,
          restrict = Some(pmod(col("id_a"), lit(2)) === 0 &&
            pmod(col("id_b"), lit(2)) === 0))
        rounds.foreach(graft.ops.Caching.release)
        gate
      },
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents WHERE doc_id % 2 = 0))
              |SELECT count(*)::bigint AS n_exact, true AS precision_ok, true AS recall_ok
              |FROM d a JOIN d b ON a.doc_id < b.doc_id
              |WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
              |   cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double) >= 0.4""".stripMargin)),

    // ---- substring-level duplication signal (Lee et al.'s dedup metric,
    //      aggregated per doc): fraction of each doc's distinct 3-grams
    //      occurring in ≥2 docs corpus-wide. Two shuffles, no self-join —
    //      the df count is the same aggregation that powers the hot-shingle
    //      cap, surfaced as data.
    Q("text_dup_ngrams",
      (s, dir) => Dedup.duplicateShingleStats(
          T(s, dir, "documents"), "doc_id", "text", shingleK = 3, minDf = 2L)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_dup"),
          round(col("dup_frac"), 6).as("dup_frac")),
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | inv AS (SELECT doc_id, unnest(sh) AS g FROM d),
              | dfc AS (SELECT g FROM inv GROUP BY g HAVING count(*) >= 2),
              | dup AS (SELECT doc_id, count(*) AS n_dup FROM inv
              |         WHERE g IN (SELECT g FROM dfc) GROUP BY doc_id)
              |SELECT d.doc_id, cast(len(d.sh) as bigint) AS n_grams,
              | cast(coalesce(dup.n_dup, 0) as bigint) AS n_dup,
              | round(cast(coalesce(dup.n_dup, 0) as double) /
              |   cast(greatest(len(d.sh), 1) as double), 6) AS dup_frac
              |FROM d LEFT JOIN dup ON d.doc_id = dup.doc_id""".stripMargin)),

    // ---- exact-count stratified sample: exactly 10 docs per source in
    //      deterministic md5-bucket order — the fixed-quota companion to
    //      rate-based pipeline_mix_sample. Output size is quota-bound
    //      (never data-sized; 10 < per-source count at every SF, so the
    //      rank genuinely selects); the window sorts each stratum once.
    Q("pipeline_stratified_sample",
      (s, dir) => graft.ops.Sampling.stratifiedSample(
          T(s, dir, "documents"), "source", "doc_id", n = 10)
        .select("source", "doc_id"),
      Some("""SELECT source, doc_id
              |FROM (SELECT source, doc_id,
              |  row_number() OVER (PARTITION BY source
              |    ORDER BY ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000,
              |             doc_id) AS rn
              | FROM documents)
              |WHERE rn <= 10""".stripMargin)),

    // ---- leakage-safe 80/10/10 split: near-dup clusters (connected
    //      components over exact jaccard pairs) are split by their ROOT's
    //      hash, so paraphrase pairs can never straddle train/test. The
    //      oracle replays clustering (recursive CTE), assignment, and the
    //      straddling-pair count — n_leaky_pairs is COMPUTED on both sides
    //      and must be 0, not pinned.
    Q("pipeline_group_split",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val pairs = Dedup.jaccardPairsInverted(docs, "doc_id", "text",
          shingleK = 3, threshold = 0.05).select("id_a", "id_b")
        try {
          val clusters = graft.ops.Cluster.dedupClusters(pairs)
            .select("id", "cluster_id")
          val split = graft.ops.Sampling.leakageSafeSplit(
            docs, "doc_id", clusters, trainBps = 8000, valBps = 1000)
          val leaky = pairs
            .join(split.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
            .join(split.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
            .filter(col("split_a") =!= col("split_b"))
            .agg(count(lit(1)).as("n_leaky_pairs"))
          split.groupBy("split")
            .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
            .crossJoin(leaky)
            .localCheckpoint(true)
        } finally graft.ops.Caching.release(pairs)
      },
      Some("""WITH RECURSIVE d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | e AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM d a JOIN d b ON a.doc_id < b.doc_id
              |  WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
              |    cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double) >= 0.05),
              | und AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
              | reach(id, r) AS (
              |  SELECT u, u FROM und
              |  UNION
              |  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.id),
              | roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
              | keyed AS (SELECT doc_id, n_chars,
              |    coalesce(root, doc_id) AS gk
              |   FROM documents LEFT JOIN roots ON doc_id = roots.id),
              | assigned AS (SELECT doc_id, n_chars,
              |    CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
              |   FROM (SELECT *, ('0x' || substr(md5(cast(gk as varchar)), 1, 8))::bigint % 10000 AS b
              |         FROM keyed)),
              | leaky AS (SELECT count(*)::bigint AS n_leaky_pairs
              |   FROM e JOIN assigned sa ON e.id_a = sa.doc_id
              |          JOIN assigned sb ON e.id_b = sb.doc_id
              |   WHERE sa.split <> sb.split)
              |SELECT split, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_chars,
              |       (SELECT n_leaky_pairs FROM leaky) AS n_leaky_pairs
              |FROM assigned GROUP BY split""".stripMargin)),

    // ---- C4-style duplicated-block removal (the REMOVAL counterpart of
    //      text_dup_ngrams' measurement): consecutive 8-word blocks are the
    //      newline-free corpus's "lines"; a block in >= 2 distinct docs is
    //      boilerplate and every doc is reassembled from its survivors in
    //      order. Exact semantics end-to-end — the oracle replays chunking,
    //      the distinct-doc frequency cut, and ordered reassembly, and the
    //      hash gate covers the rebuilt text byte-for-byte.
    Q("pipeline_block_dedup",
      (s, dir) => Dedup.removeDuplicateBlocks(
          T(s, dir, "documents"), "doc_id", "text", blockWords = 8, minDf = 2L)
        .select(col("id").as("doc_id"), col("n_blocks"), col("n_removed"),
          col("clean_text")),
      Some("""WITH w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words FROM documents),
              | nb AS (SELECT doc_id, words, (len(words) + 7) // 8 AS n_blocks FROM w),
              | b AS (SELECT doc_id, cast(t.i as bigint) AS pos,
              |        array_to_string(list_slice(words, t.i*8+1, t.i*8+8), ' ') AS block
              |       FROM nb, unnest(range(0, n_blocks)) AS t(i)),
              | hot AS (SELECT block FROM b GROUP BY block HAVING count(distinct doc_id) >= 2),
              | reb AS (SELECT doc_id AS rid, count(*) AS n_kept,
              |         string_agg(block, ' ' ORDER BY pos) AS clean_text
              |         FROM b WHERE block NOT IN (SELECT block FROM hot) GROUP BY doc_id)
              |SELECT nb.doc_id, cast(nb.n_blocks as bigint) AS n_blocks,
              | cast(nb.n_blocks - coalesce(reb.n_kept, 0) as bigint) AS n_removed,
              | coalesce(reb.clean_text, '') AS clean_text
              |FROM nb LEFT JOIN reb ON nb.doc_id = reb.rid""".stripMargin)),

    // ---- sliding-window exact duplicate-SPAN removal (the ExactSubstr step
    //      of Lee et al., where pipeline_block_dedup only sees aligned block
    //      boundaries): any 8-token window occurring >= 2 times corpus-wide
    //      (total occurrences — within-doc repeats count) is removed
    //      wherever it occurs, and docs reassemble from surviving tokens.
    //      The oracle replays the whole selection: same grams, same counts,
    //      same rows-frame coverage (dense positions make ROWS ≡ the
    //      engine's RANGE-over-union), same ordered reassembly.
    Q("pipeline_span_dedup",
      (s, dir) => Dedup.removeDuplicateSpans(
          T(s, dir, "documents"), "doc_id", "text", spanK = 8, minCount = 2L)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          col("clean_text")),
      Some("""WITH w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words FROM documents),
              | t AS (SELECT doc_id, cast(r.i as bigint) AS pos, words[r.i+1] AS tok
              |       FROM w, unnest(range(0, len(words))) AS r(i)),
              | g AS (SELECT doc_id, cast(r.i as bigint) AS pos,
              |        array_to_string(list_slice(words, r.i+1, r.i+8), ' ') AS gram
              |       FROM w, unnest(range(0, greatest(len(words)-7, 0))) AS r(i)),
              | hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
              | f AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM hot)),
              | c AS (SELECT t.doc_id, t.pos, t.tok,
              |        max(CASE WHEN f.pos IS NOT NULL THEN 1 ELSE 0 END)
              |          OVER (PARTITION BY t.doc_id ORDER BY t.pos
              |                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
              |       FROM t LEFT JOIN f ON t.doc_id = f.doc_id AND t.pos = f.pos),
              | reb AS (SELECT doc_id AS rid, count(*) AS n_kept,
              |         string_agg(tok, ' ' ORDER BY pos) AS clean_text
              |         FROM c WHERE cov = 0 GROUP BY doc_id)
              |SELECT w.doc_id, cast(len(words) as bigint) AS n_tokens,
              | cast(len(words) - coalesce(reb.n_kept, 0) as bigint) AS n_removed,
              | coalesce(reb.clean_text, '') AS clean_text
              |FROM w LEFT JOIN reb ON w.doc_id = reb.rid""".stripMargin)),

    // ---- overlapping token-window chunking (the embedding-ingest step):
    //      64-token chunks, 16-token overlap → stride 48; every token
    //      covered, last chunk clipped, empty docs yield nothing. Pure
    //      map work — zero shuffles — and the oracle replays the start/
    //      slice arithmetic exactly.
    Q("pipeline_chunk_docs",
      (s, dir) => TextAnalysis.chunkDocuments(
          T(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, overlapTokens = 16)
        .select(col("id").as("doc_id"), col("chunk_id"), col("start_tok"),
          col("n_tok"), col("chunk_text")),
      Some("""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
              |  FROM documents WHERE length(trim(text)) > 0),
              | n AS (SELECT doc_id, w, CASE WHEN len(w) <= 64 THEN 1
              |        ELSE 1 + cast(ceil((len(w) - 64) / 48.0) as int) END AS nc FROM d),
              | c AS (SELECT doc_id, cast(t.i as bigint) AS chunk_id,
              |        cast(t.i * 48 as bigint) AS start_tok,
              |        list_slice(w, t.i * 48 + 1, t.i * 48 + 64) AS toks
              |       FROM n, unnest(range(0, nc)) AS t(i))
              |SELECT doc_id, chunk_id, start_tok,
              | cast(len(toks) as bigint) AS n_tok,
              | array_to_string(toks, ' ') AS chunk_text FROM c""".stripMargin)),

    // ---- Content-defined chunking: boundaries from the local 3-gram hash
    //      (mod 32 → E[len]≈32 tokens; 128-token drought cap), so chunk-level
    //      dedup keys survive document edits (LBFS §3.1). The oracle replays
    //      the SAME construction in window-function form (per-position
    //      boundary flags → cumulative natural-chunk ids → capped sub-ids) —
    //      an independent formulation of the semantics, strengthening the
    //      check beyond expression-for-expression replay.
    Q("pipeline_cdc_chunk",
      (s, dir) => TextAnalysis.cdcChunkDocuments(
          T(s, dir, "documents"), "doc_id", "text",
          windowK = CdcWindowK, divisor = CdcDivisor, maxChunkTokens = CdcMaxChunkTokens)
        .select(col("id").as("doc_id"), col("chunk_id"), col("start_tok"),
          col("n_tok"), col("chunk_text"), col("chunk_md5")),
      Some(s"""$cdcChunkOracleCte
              |SELECT doc_id,
              | row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) - 1 AS chunk_id,
              | start_tok, n_tok, chunk_text, md5(chunk_text) AS chunk_md5
              |FROM ch""".stripMargin)),

    // ---- Chunk-level dedup accounting over the CDC chunks — the LBFS use
    //      case itself: identical chunk hashes across documents are the
    //      storage/training-data savings the edit-stable boundaries exist to
    //      expose. One grouped aggregate on the chunk hash; near-dup docs in
    //      the corpus surface as multi-doc chunks.
    Q("dedup_cdc_chunks",
      (s, dir) => TextAnalysis.cdcChunkDocuments(
          T(s, dir, "documents"), "doc_id", "text",
          windowK = CdcWindowK, divisor = CdcDivisor, maxChunkTokens = CdcMaxChunkTokens)
        .groupBy(col("chunk_md5"))
        .agg(countDistinct(col("id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          max(col("n_tok")).as("n_tok")),
      Some(s"""$cdcChunkOracleCte
              |SELECT md5(chunk_text) AS chunk_md5,
              | count(distinct doc_id) AS n_docs,
              | cast(count(*) as bigint) AS n_occurrences,
              | max(n_tok) AS n_tok
              |FROM ch GROUP BY 1""".stripMargin)),

    // ---- Okapi BM25 ranked retrieval for a fixed 3-term query — the
    //      lexical top-k next to the ANN family. Per-term tf is a
    //      higher-order filter/size over the token array (no explode, no
    //      shuffle); corpus stats are ONE broadcast aggregate row; the
    //      only data-sized exchange is the global top-k reduce. Scores
    //      round(…,6) against summation-order ulps; ties at the cut break
    //      by doc_id in both engines, so the selected set is exact.
    Q("text_bm25_topk",
      (s, dir) => TextAnalysis.bm25TopK(
          T(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("spark", "join", "window"), topK = 20)
        .select(col("id").as("doc_id"), col("dl"), col("score")),
      Some("""WITH d AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS w FROM documents),
              | f AS (SELECT doc_id, cast(len(w) as double) AS dl,
              |        cast(len(list_filter(w, x -> x = 'spark')) as double) AS tf0,
              |        cast(len(list_filter(w, x -> x = 'join')) as double) AS tf1,
              |        cast(len(list_filter(w, x -> x = 'window')) as double) AS tf2
              |       FROM d),
              | s AS (SELECT sum(dl) AS sum_dl, cast(count(*) as double) AS n_docs,
              |        sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
              |        sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
              |        sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2 FROM f),
              | sc AS (SELECT doc_id, cast(dl as bigint) AS dl,
              |        round(
              |          ln((n_docs - df0 + 0.5)/(df0 + 0.5) + 1.0) * tf0 * 2.2
              |            / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
              |        + ln((n_docs - df1 + 0.5)/(df1 + 0.5) + 1.0) * tf1 * 2.2
              |            / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
              |        + ln((n_docs - df2 + 0.5)/(df2 + 0.5) + 1.0) * tf2 * 2.2
              |            / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs))), 6)
              |          AS score
              |       FROM f, s)
              |SELECT doc_id, dl, score FROM sc WHERE score > 0.0
              |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- training-shard export manifest: consecutive 256-row shards in
    //      deterministic (md5-bucket, id) order, numbered by the
    //      DISTRIBUTED two-pass global row_number (bucket counts → driver
    //      prefix sums → per-bucket parallel windows) — the scale-safe
    //      form of the single-partition ORDER BY the oracle can afford to
    //      use. Manifest rows (counts, sizes, shard-order endpoints, id
    //      checksum) are exact and fully hash-gated.
    Q("pipeline_shard_export",
      (s, dir) => graft.ops.Packing.shardManifest(
          T(s, dir, "documents"), "doc_id", "n_chars", shardSize = 256)
        .select(col("shard_id"), col("n_docs"), col("total_size"),
          col("first_id"), col("last_id"), col("id_sum")),
      Some("""WITH o AS (SELECT doc_id, n_chars,
              |   ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000 AS hb
              |  FROM documents),
              | r AS (SELECT doc_id, n_chars,
              |   row_number() OVER (ORDER BY hb, doc_id) AS rn FROM o)
              |SELECT cast((rn - 1) // 256 as bigint) AS shard_id,
              | count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_size,
              | min_by(doc_id, rn) AS first_id, max_by(doc_id, rn) AS last_id,
              | cast(sum(doc_id) as bigint) AS id_sum
              |FROM r GROUP BY 1""".stripMargin)),

    // ---- percentile quality cut (the FineWeb-style "drop the worst X% by
    //      score" step): the threshold is the corpus's exact 20th
    //      percentile of stopword ratio (percentile ≡ quantile_cont
    //      parity, as in q_percentiles), then per-source keep counts and
    //      kept volume. Membership at the boundary is ulp-stable: an
    //      interpolated threshold either equals a data value exactly (tie
    //      or integral rank — lo + f·0 = lo in both engines) or lies
    //      strictly between adjacent ones. At 100 TB swap the exact
    //      percentile for percentile_approx (the q_approx_percentiles
    //      trade) — one bounded-state agg instead of a full sort digest.
    Q("pipeline_quality_filter",
      (s, dir) => {
        val scored = T(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars"), TextAnalysis.stopwordHitRatio(col("text")).as("score"))
        val thr = scored.agg(percentile(col("score"), lit(0.2)).as("thr"))
        scored.crossJoin(broadcast(thr))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("score") >= col("thr"), lit(1))).as("n_kept"),
            coalesce(sum(when(col("score") >= col("thr"), col("n_chars"))), lit(0L))
              .as("kept_chars"),
            round(first(col("thr")), 6).as("threshold"))
      },
      Some(s"""WITH sc AS (SELECT doc_id, source, n_chars,
               | CASE WHEN length(trim(text)) = 0 THEN 0.0
               |   ELSE cast(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
               |        t -> list_contains(${duckList(TextAnalysis.EnglishStopwords)}, t))) as double)
               |        / cast(len(regexp_split_to_array(trim(lower(text)), '\\s+')) as double) END AS score
               | FROM documents),
               | t AS (SELECT quantile_cont(score, 0.2) AS thr FROM sc)
               |SELECT source, count(*) AS n_docs,
               | count(CASE WHEN score >= thr THEN 1 END) AS n_kept,
               | cast(coalesce(sum(CASE WHEN score >= thr THEN n_chars END), 0) as bigint) AS kept_chars,
               | round(thr, 6) AS threshold
               |FROM sc, t GROUP BY source, thr""".stripMargin)),

    // ---- CCNet-style unigram LM scoring: every doc's mean token
    //      log-probability under the corpus's own unigram distribution —
    //      the perplexity-filter signal with an exactly replayable model.
    //      Shape: one vocab agg (map-side combined), vocab broadcast back
    //      onto the exploded stream, one per-doc agg — the LM "training"
    //      and "scoring" passes of a 100 TB perplexity filter, where the
    //      vocab table is precisely the executor-broadcastable model
    //      state. avg-of-logs is order-dependent in the last ulps, so both
    //      engines surface round(…, 6).
    Q("text_unigram_logprob",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        val total = vocab.agg(sum("c").as("n"))
        val scored = toks.join(broadcast(vocab), Seq("tok"))
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(avg(log(col("c").cast("double") / col("n").cast("double"))), 6)
              .as("avg_logprob"))
        docs.select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
      },
      Some("""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
              |  FROM documents WHERE length(trim(text)) > 0),
              | v AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
              | n AS (SELECT cast(sum(c) as double) AS n FROM v),
              | sc AS (SELECT doc_id, count(*) AS n_tokens,
              |    round(avg(ln(c / n)), 6) AS avg_logprob
              |   FROM tk JOIN v USING (tok), n GROUP BY doc_id)
              |SELECT d.doc_id, cast(coalesce(sc.n_tokens, 0) as bigint) AS n_tokens,
              | coalesce(sc.avg_logprob, 0.0) AS avg_logprob
              |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin)),

    // ---- within-doc token entropy + type-token ratio — the last member
    //      of the quality-signal family (surface stats → repetition →
    //      corpus-LM logprob → own-distribution entropy). H = ln n −
    //      (Σ c·ln c)/n, so one (doc,tok) count agg and one per-doc agg
    //      suffice — two map-side-combined shuffles, no join against a
    //      model. round(…,6) absorbs summation-order ulps as elsewhere.
    Q("text_entropy",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val tf = docs.select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val ent = tf.groupBy("doc_id").agg(
            sum("c").as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sum(col("c").cast("double") * log(col("c").cast("double"))).as("sclc"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            round(log(col("n_tokens").cast("double")) -
              col("sclc") / col("n_tokens").cast("double"), 6).as("entropy"),
            round(col("n_distinct").cast("double") /
              col("n_tokens").cast("double"), 6).as("ttr"))
        docs.select(col("doc_id")).join(ent, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
            coalesce(col("entropy"), lit(0.0)).as("entropy"),
            coalesce(col("ttr"), lit(0.0)).as("ttr"))
      },
      Some("""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
              |  FROM documents WHERE length(trim(text)) > 0),
              | tf AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY doc_id, tok),
              | e AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
              |    round(ln(cast(sum(c) as double)) -
              |      sum(cast(c as double) * ln(cast(c as double))) / cast(sum(c) as double), 6) AS entropy,
              |    round(cast(count(*) as double) / cast(sum(c) as double), 6) AS ttr
              |   FROM tf GROUP BY doc_id)
              |SELECT d.doc_id, cast(coalesce(e.n_tokens, 0) as bigint) AS n_tokens,
              | cast(coalesce(e.n_distinct, 0) as bigint) AS n_distinct,
              | coalesce(e.entropy, 0.0) AS entropy, coalesce(e.ttr, 0.0) AS ttr
              |FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id""".stripMargin)),

    // ---- winnowing fingerprints (Schleimer et al. 2003 / MOSS): per-doc
    //      selected-fingerprint count and xor checksum. md5-derived gram
    //      hashes make the window argmin itself engine-replayable, so this
    //      is EXACT — the whole selection (windows, tie rule, dedup) is
    //      re-run by the oracle, not just pinned.
    Q("text_winnow",
      (s, dir) => TextAnalysis.winnowingFingerprints(
          T(s, dir, "documents"), "doc_id", "text", k = 3, w = 4)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_fps"),
          coalesce(expr("bit_xor(fp_hash)"), lit(0L)).as("fp_xor")),
      Some("""WITH d AS (SELECT doc_id, CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | g AS (SELECT doc_id, cast(t.i - 1 as bigint) AS pos,
              |        ('0x' || substr(md5(sh[t.i]), 1, 15))::bigint AS h
              |       FROM d, unnest(range(1, len(sh) + 1)) AS t(i)),
              | wm AS (SELECT doc_id, pos,
              |        count(*) OVER (PARTITION BY doc_id) AS n,
              |        min(struct_pack(h := h, p := pos)) OVER (PARTITION BY doc_id ORDER BY pos
              |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
              |       FROM g),
              | sel AS (SELECT DISTINCT doc_id, struct_extract(mn, 'h') AS fp_hash,
              |          struct_extract(mn, 'p') AS fp_pos
              |         FROM wm WHERE pos <= n - 4 OR (n < 4 AND pos = 0))
              |SELECT doc_id, count(*) AS n_fps,
              | cast(coalesce(bit_xor(fp_hash), 0) as bigint) AS fp_xor
              |FROM sel GROUP BY doc_id""".stripMargin)),

    // ---- MOSS overlap pairs: docs sharing >= 3 winnowing fingerprints,
    //      with the shared count as the score — exact end-to-end, because
    //      the selection itself is replayable (see text_winnow). The
    //      inverted-index self-join takes the same optional hot-key cap as
    //      the shingle pair ops (uncapped here, like dedup_jaccard_exact).
    Q("dedup_winnow_pairs",
      (s, dir) => TextAnalysis.winnowOverlapPairs(
          T(s, dir, "documents"), "doc_id", "text", k = 3, w = 4, minShared = 3L),
      Some("""WITH d AS (SELECT doc_id, CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | g AS (SELECT doc_id, cast(t.i - 1 as bigint) AS pos,
              |        ('0x' || substr(md5(sh[t.i]), 1, 15))::bigint AS h
              |       FROM d, unnest(range(1, len(sh) + 1)) AS t(i)),
              | wm AS (SELECT doc_id, pos,
              |        count(*) OVER (PARTITION BY doc_id) AS n,
              |        min(struct_pack(h := h, p := pos)) OVER (PARTITION BY doc_id ORDER BY pos
              |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
              |       FROM g),
              | sel AS (SELECT DISTINCT doc_id, struct_extract(mn, 'h') AS fp_hash
              |         FROM wm WHERE pos <= n - 4 OR (n < 4 AND pos = 0))
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
              |FROM sel a JOIN sel b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
              |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin)),

    // ---- MOSS matched spans: the ranges MOSS renders — shared fingerprint
    //      anchors chained per (pair, diagonal) into maximal runs, each
    //      reported as [start, end] token spans in both docs. The whole
    //      reconstruction (winnowing selection + diagonal islands) replays
    //      EXACTLY in SQL thanks to the md5-derived gram hashes.
    Q("dedup_winnow_spans",
      (s, dir) => TextAnalysis.winnowOverlapSpans(
          T(s, dir, "documents"), "doc_id", "text", k = 3, w = 4, minFps = 2L),
      Some("""WITH d AS (SELECT doc_id, CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
              |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
              |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
              |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
              |        FROM documents)),
              | g AS (SELECT doc_id, cast(t.i - 1 as bigint) AS pos,
              |        ('0x' || substr(md5(sh[t.i]), 1, 15))::bigint AS h
              |       FROM d, unnest(range(1, len(sh) + 1)) AS t(i)),
              | wm AS (SELECT doc_id, pos,
              |        count(*) OVER (PARTITION BY doc_id) AS n,
              |        min(struct_pack(h := h, p := pos)) OVER (PARTITION BY doc_id ORDER BY pos
              |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
              |       FROM g),
              | sel AS (SELECT DISTINCT doc_id, struct_extract(mn, 'h') AS fp_hash,
              |          struct_extract(mn, 'p') AS fp_pos
              |         FROM wm WHERE pos <= n - 4 OR (n < 4 AND pos = 0)),
              | m AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              |        a.fp_pos AS pos_a, b.fp_pos - a.fp_pos AS diag
              |       FROM sel a JOIN sel b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id),
              | r AS (SELECT *, CASE WHEN lag(pos_a) OVER w IS NULL
              |          OR pos_a - lag(pos_a) OVER w > 6 THEN 1 ELSE 0 END AS brk
              |       FROM m WINDOW w AS (PARTITION BY id_a, id_b, diag ORDER BY pos_a)),
              | rr AS (SELECT *, sum(brk) OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM r)
              |SELECT id_a, id_b, min(pos_a) AS start_a, max(pos_a) + 2 AS end_a,
              | min(pos_a) + diag AS start_b, max(pos_a) + 2 + diag AS end_b,
              | count(*) AS n_fps
              |FROM rr GROUP BY id_a, id_b, diag, run HAVING count(*) >= 2""".stripMargin)),

    // --- BPE tokenizer end-to-end: train → compiled encode → counts. ---
    // Bpe.train pays the corpus shuffle ONCE (word-frequency groupBy), then
    // iterates aggregates over the |vocab|-row symbol table; only each
    // round's winning pair reaches the driver. The merge list broadcasts
    // into the codegen'd BpeEncode for the corpus-scale map-only encode.
    // Oracle strategy: the TRAINED encode is gated by exactly-replayable
    // invariants (per-doc roundtrip, n_words ≤ n_tokens ≤ n_chars bounds,
    // merge-list size); a PINNED merge list of char-disjoint pairs makes
    // the token count itself oracle-exact — merging (l,r) with all pair
    // characters distinct can neither chain nor interact, so
    // tokens = non-space chars − substring occurrences, which DuckDB
    // replays with replace() arithmetic. Invariant correctness beyond SQL's
    // reach (merge order, tie-breaks, fixpoint loop) is golden-spec'd
    // against an independent interpreted implementation in BpeSpec.
    Q("pipeline_bpe_tokenize",
      (s, dir) => {
        import graft.ops.Bpe
        val docs = T(s, dir, "documents")
        val trained = Bpe.train(docs, "text", nMerges = 24)
        val words = TextAnalysis.tokens(col("text"))
        val enc = Bpe.encode(words, trained)
        val encPinned = Bpe.encode(words, TextQueries.pinnedMerges)
        val nChars = length(concat_ws("", words)).cast("long")
        // Two compiled-encode fixpoint loops per row — fan the (single-split
        // at test scale) corpus out before the compute-dense map.
        graft.ops.Par.fanOut(docs).select(col("doc_id"),
          size(words).cast("long").as("n_words"),
          nChars.as("n_chars"),
          size(encPinned).cast("long").as("n_tokens_pinned"),
          (concat_ws("", enc) === concat_ws("", words) &&
            concat_ws("", encPinned) === concat_ws("", words)).as("roundtrip_ok"),
          (size(enc).cast("long") >= size(words) &&
            size(enc).cast("long") <= nChars).as("bounds_ok"),
          lit(trained.size).cast("long").as("n_merges"))
      },
      Some(s"""WITH w AS (SELECT doc_id,
              |   CASE WHEN length(trim(text)) = 0 THEN 0
              |        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::bigint AS n_words,
              |   length(regexp_replace(text, '\\s', '', 'g'))::bigint AS n_chars,
              |   text FROM documents)
              |SELECT doc_id, n_words, n_chars,
              |  n_chars${pinnedOccSql("text")} AS n_tokens_pinned,
              |  TRUE AS roundtrip_ok, TRUE AS bounds_ok,
              |  24::bigint AS n_merges
              |FROM w""".stripMargin)),

    // Token-budget selection driven by REAL BpeEncode counts (the pinned
    // char-disjoint merges keep the whole selection SQL-replayable): same
    // per-source cumulative-budget shape as pipeline_token_budget, with the
    // whitespace token count replaced by the compiled BPE encode's output
    // size — the "budget in tokenizer tokens, not words" form an LLM
    // training pipeline actually needs.
    Q("pipeline_token_budget_bpe",
      (s, dir) => {
        import graft.ops.Bpe
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val words = TextAnalysis.tokens(col("text"))
        graft.ops.Par.fanOut(T(s, dir, "documents"))
          .select(col("source"), col("doc_id"),
            size(Bpe.encode(words, TextQueries.pinnedMerges)).cast("long").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .filter(col("cum") <= 40000L)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |   length(regexp_replace(text, '\\s', '', 'g'))::bigint${pinnedOccSql("text")} AS n
              |  FROM documents),
              | o AS (SELECT source, n,
              |   sum(n) OVER (PARTITION BY source ORDER BY doc_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM t)
              |SELECT source, count(*) AS n_docs, cast(sum(n) as bigint) AS total_tokens
              |FROM o WHERE cum <= 40000 GROUP BY source""".stripMargin)),

    // Fixed-length sequence packing over REAL BpeEncode counts (pinned
    // char-disjoint merges keep the chunk math SQL-replayable): the same
    // greedy offset packing as pipeline_pack_sequences with the whitespace
    // count swapped for the compiled encode's output size — seqLen scaled
    // up because subword counts run ~5x word counts on this corpus.
    Q("pipeline_pack_sequences_bpe",
      (s, dir) => {
        import graft.ops.Bpe
        val words = TextAnalysis.tokens(col("text"))
        val d = graft.ops.Par.fanOut(T(s, dir, "documents"))
          .select(col("source"), col("doc_id"),
            size(Bpe.encode(words, TextQueries.pinnedMerges)).cast("long").as("n_tokens"))
        graft.ops.Packing.chunkStats(d, "doc_id", "n_tokens",
          seqLen = 2048, shardCol = Some("source"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |   length(regexp_replace(text, '\\s', '', 'g'))::bigint${pinnedOccSql("text")} AS n
              |  FROM documents),
              | o AS (SELECT source, doc_id, n,
              |   cast(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS off
              |  FROM t),
              | e AS (SELECT source, n, off,
              |   unnest(range(off // 2048, (off + n - 1) // 2048 + 1)) AS chunk_id
              |  FROM o WHERE n > 0)
              |SELECT source, chunk_id, count(*) AS n_docs,
              | cast(sum(least(off + n, (chunk_id + 1) * 2048) - greatest(off, chunk_id * 2048)) as bigint) AS n_tokens
              |FROM e GROUP BY source, chunk_id""".stripMargin)),

    // Heavy hitters via a Misra–Gries sketch (mergeable-summaries MG-64):
    // the corpus-wide shuffle carries ≤64-entry summaries per task instead
    // of the full token domain (the sketch-then-exact shape of the ANN
    // family applied to frequency). Candidates are a bounded driver fetch
    // (≤64 structs); the MG bound (undercount ≤ n/65 < ceil(n/40), which
    // survives map-side merges) guarantees the candidate set covers every
    // true heavy hitter, and the exact count of candidates makes the final
    // answer deterministic and sketch-error-free — fully SQL-replayable.
    Q("text_heavy_hitters",
      (s, dir) => {
        import graft.functions.MisraGries
        val m = 40
        val toks = T(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
        val row = toks.agg(MisraGries.mg_topk(col("token"), 64).as("cands"),
          count(lit(1)).as("n")).head()
        val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
        val n = row.getLong(1)
        val thresh = (n + m - 1) / m
        if (cands.isEmpty)
          toks.groupBy("token").agg(count(lit(1)).as("n")).filter(lit(false))
        else
          toks.filter(col("token").isin(cands: _*))
            .groupBy("token").agg(count(lit(1)).as("n"))
            .filter(col("n") >= thresh)
      },
      Some("""WITH t AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
              |        FROM documents WHERE length(trim(text)) > 0),
              | tot AS (SELECT count(*) AS n FROM t)
              |SELECT token, count(*) AS n FROM t GROUP BY token
              |HAVING count(*) >= (SELECT (n + 39) // 40 FROM tot)""".stripMargin)),

    // ---- the COMPOSED training-data pipeline, one lineage over the
    //      manifested table: ingest (two snapshot commits, duplicate-seeded)
    //      → clean (length floor) → exact dedup (min-id per content hash)
    //      → decontaminate (anti-join vs a benchmark text set) → temperature
    //      mix (α = 0.5, rates from the post-filter counts) → pack
    //      (greedy sequence packing at 4096 by doc_id order). Every stage
    //      passes individually elsewhere; this query pins their COMPOSITION
    //      against drift — the full chain replayed by DuckDB, hash-gated,
    //      with packing structure (chunk count / packed tokens / densest
    //      chunk) as extra gates.
    Q("pipeline_end_to_end",
      (s, dir) => {
        val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = T(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        // Ingest: two appends into a manifested table; the second batch
        // seeds exact duplicates (same text, shifted ids) for dedup to kill.
        val table = java.nio.file.Files.createTempDirectory("graft_e2e")
          .toString + "/corpus"
        docs.filter(col("doc_id") % 3 =!= 0).repartition(4).write.parquet(table)
        graft.ops.Manifest.create(s, table, "doc_id")
        docs.filter(col("doc_id") % 3 === 0)
          .unionByName(docs.filter(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + maxId + 1))
          .repartition(2).write.mode("append").parquet(table)
        graft.ops.Manifest.createIncremental(s, table, "doc_id")
        val corpus = graft.ops.Manifest.readAsOf(s, table,
          graft.ops.Manifest.latestSnapshotId(s, table).get)
        // Clean → exact dedup → decontaminate (bench = every 97th doc).
        val clean = corpus.filter(col("n_chars") >= 20)
        val deduped = graft.ops.Dedup.dedupExact(clean, "doc_id", Seq("text"))
        val bench = docs.filter(col("doc_id") % 97 === 0).select("text")
        val decon = deduped.join(bench, Seq("text"), "left_anti")
        // Temperature mix over sources, rates from the post-filter counts.
        val (mixed0, _) = graft.ops.Sampling.mixByTemperature(
          decon, "doc_id", "source", alpha = 0.5)
        // One materialization of the mixed frame feeds both consumers; the
        // checkpoint blocks are released by the harness AFTER the returned
        // frame (whose plan holds the checkpointed leaf) is consumed.
        val mixed = mixed0.localCheckpoint(true)
        // Pack at 4096 by doc_id order; structural gates from chunkStats.
        val chunks = graft.ops.Packing.chunkStats(
          mixed, "doc_id", "n_chars", seqLen = 4096)
        val cRow = chunks.agg(count(lit(1)), sum("n_tokens"), max("n_docs")).head()
        graft.functions.Hashing.multisetFingerprintAgg(
            mixed.select(docCols.map(col): _*), docCols)
          .withColumn("n_chunks", lit(cRow.getLong(0)))
          .withColumn("packed_tokens", lit(cRow.getLong(1)))
          .withColumn("max_chunk_docs", lit(cRow.getLong(2)))
      },
      Some(s"""WITH b AS (SELECT max(doc_id) AS mx FROM documents),
               | ingested AS (
               |  SELECT doc_id, text, lang, source, n_chars FROM documents
               |  UNION ALL
               |  SELECT doc_id + b.mx + 1, text, lang, source, n_chars
               |   FROM documents, b WHERE doc_id < 50),
               | clean AS (SELECT * FROM ingested WHERE n_chars >= 20),
               | dedup AS (SELECT * FROM (
               |   SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
               |   FROM clean) WHERE rn = 1),
               | decon AS (SELECT * FROM dedup
               |   WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 97 = 0)),
               | c AS (SELECT source, count(*) AS n FROM decon GROUP BY source),
               | m AS (SELECT min(n) AS nmin FROM c),
               | r AS (SELECT source,
               |   CAST(round(10000 * sqrt(CAST(nmin AS double) / n)) AS BIGINT) AS rate_bps
               |  FROM c, m),
               | mixed AS (SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
               |  FROM decon d JOIN r ON d.source = r.source
               |  WHERE ('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::bigint % 10000
               |        < r.rate_bps),
               | po AS (SELECT doc_id, n_chars,
               |   coalesce(sum(n_chars) OVER (ORDER BY doc_id
               |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
               |  FROM mixed WHERE n_chars > 0),
               | ch AS (SELECT doc_id,
               |   unnest(generate_series(CAST(off // 4096 AS BIGINT),
               |                          CAST((off + n_chars - 1) // 4096 AS BIGINT))) AS chunk_id,
               |   off, n_chars FROM po),
               | cs AS (SELECT chunk_id, count(*) AS n_docs,
               |   sum(least(off + n_chars, (chunk_id + 1) * 4096) -
               |       greatest(off, chunk_id * 4096)) AS n_tokens
               |  FROM ch GROUP BY chunk_id)
               |SELECT *,
               | (SELECT count(*) FROM cs)::BIGINT AS n_chunks,
               | (SELECT cast(sum(n_tokens) as bigint) FROM cs) AS packed_tokens,
               | (SELECT cast(max(n_docs) as bigint) FROM cs) AS max_chunk_docs
               |FROM (
               |${Registry.duckMultisetFingerprint(
                   Seq("doc_id", "text", "lang", "source", "n_chars"), "mixed t")})""".stripMargin))
  )

  /** Full-corpus exact 3-shingle Jaccard ≥ 0.4 pair set for `dir`'s
    * `documents` table (hashed-gram inverted-index join — no
    * array-intersect self-join), cached per (application, sfDir) for the
    * JVM's lifetime as a checkpointed pair-sized frame. Three ingest
    * queries gate against the SAME ground truth; recomputing it per query
    * priced the oracle — the exact work the LSH index exists to avoid —
    * into every ingest measurement. The cache is deliberately never
    * released: it holds only `(id_a, id_b)` pairs, and Verify/Bench reuse
    * it across queries and repeat runs.
    */
  private val exactPairsCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private[queries] def exactJaccardPairs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    exactPairsCache.computeIfAbsent(s.sparkContext.applicationId + "|" + dir, _ => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val shingled = graft.ops.Par.fanOut(
          docs.select(col("doc_id").as("id"), col("text").as("__text")))
        .select(col("id"),
          array_distinct(TextAnalysis.shingles(col("__text"), 3)).as("sh"))
        .localCheckpoint(true)
      try {
        val inv = shingled.select(col("id"), size(col("sh")).as("sz"),
          explode(transform(col("sh"), x => xxhash64(x))).as("g"))
        inv.as("a").join(inv.as("b"),
            col("a.g") === col("b.g") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
          .agg(count(lit(1)).as("inter"))
          .select(col("id_a"), col("id_b"),
            (col("inter").cast("double") /
              (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"))
          .filter(col("jaccard") >= 0.4)
          .select("id_a", "id_b")
          .localCheckpoint(true)
      } finally graft.ops.Caching.release(shingled)
    })

  /** Precision/recall gate shared by the incremental-ingest queries:
    * `(n_exact, precision_ok, recall_ok)` for the union of per-ingest
    * incremental probes in `found`, against the cached
    * [[exactJaccardPairs]] ground truth. Precision is structural (every
    * probe pair is exact-verified); recall is floored at 0.8 of the full
    * exact pair set (measured 1.0).
    */
  private[queries] def incrementalRecallGate(s: SparkSession, dir: String,
      found: org.apache.spark.sql.DataFrame,
      restrict: Option[org.apache.spark.sql.Column] = None): org.apache.spark.sql.DataFrame = {
    // `restrict` narrows the ground truth to a sub-corpus fixture (e.g. the
    // even-id half): the cached full pair set filters down for free, so a
    // cheaper fixture still gates against exact truth.
    val exact = restrict.foldLeft(exactJaccardPairs(s, dir))((df, c) => df.filter(c))
    val tp = found.join(exact, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("tp"))
    val fp = found.join(exact, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("fp"))
    exact.agg(count(lit(1)).as("n_exact")).crossJoin(tp).crossJoin(fp)
      .select(col("n_exact"),
        (col("fp") === 0).as("precision_ok"),
        (col("tp").cast("double") >=
          col("n_exact").cast("double") * 0.8).as("recall_ok"))
      .localCheckpoint(true)
  }

  /** Oracle for the incremental-ingest gates: the full-corpus exact pair
    * count with both booleans pinned TRUE.
    */
  private[queries] val incrementalIngestOracle: String =
    """WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(words) <= 3 THEN [array_to_string(words, ' ')]
      |   ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS sh
      |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::varchar[]
      |        ELSE regexp_split_to_array(trim(text), '\s+') END AS words
      |        FROM documents))
      |SELECT count(*)::bigint AS n_exact, true AS precision_ok, true AS recall_ok
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
      |   cast(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) as double) >= 0.4""".stripMargin

  /** Char-disjoint merge pairs for the oracle-exact BPE encode: all eight
    * characters distinct, so merges cannot chain (a merged two-char symbol
    * never equals any pair's single-char side) and substring occurrences in
    * the raw text count merges exactly (pairs never span whitespace).
    */
  private[queries] val pinnedMerges: Seq[(String, String)] =
    Seq("t" -> "a", "r" -> "o", "l" -> "u", "s" -> "c")

  /** `- occurrences(pair)` SQL terms for [[pinnedMerges]] over `col`:
    * DuckDB replace() drops non-overlapping occurrences left-to-right —
    * the same greedy rule BpeEncode applies.
    */
  /** The CDC chunking parameters, shared by BOTH the Spark queries and the
    * DuckDB oracle CTE below — interpolated so the query and its oracle
    * cannot silently diverge when the parameters change.
    */
  private[queries] val CdcWindowK = 3
  private[queries] val CdcDivisor = 32
  private[queries] val CdcMaxChunkTokens = 128

  /** DuckDB replay of [[TextAnalysis.cdcChunkDocuments]] ([[CdcWindowK]],
    * [[CdcDivisor]], [[CdcMaxChunkTokens]]) in window-function form —
    * per-position boundary flags → cumulative natural-chunk ids → capped
    * sub-ids → grouped chunk rows
    * `ch(doc_id, nat, sub, start_tok, n_tok, chunk_text)`. An independent
    * formulation of the array-expression construction the Spark side uses.
    * The k-gram at 0-based position i covers tokens [i-(k-1), i] — in
    * DuckDB's 1-based inclusive slice, w[u.i - (k-2) : u.i + 1].
    */
  private val cdcChunkOracleCte: String =
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      |  FROM documents WHERE length(trim(text)) > 0),
      | t AS (SELECT doc_id, cast(u.i as bigint) AS pos, w[u.i + 1] AS tok,
      |        CASE WHEN u.i >= ${CdcWindowK - 1} AND u.i < len(w) - 1 THEN
      |          ('0x' || substr(md5(array_to_string(w[u.i - ${CdcWindowK - 2} : u.i + 1], ' ')), 1, 15))::BIGINT
      |        END AS h
      |       FROM d, unnest(range(0, len(w))) AS u(i)),
      | f AS (SELECT doc_id, pos, tok,
      |        CASE WHEN h IS NOT NULL AND h % $CdcDivisor = 0 THEN 1 ELSE 0 END AS b
      |       FROM t),
      | c AS (SELECT doc_id, pos, tok,
      |        coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nat
      |       FROM f),
      | r AS (SELECT doc_id, pos, tok, nat,
      |        cast(floor((row_number() OVER (PARTITION BY doc_id, nat ORDER BY pos) - 1)
      |          / $CdcMaxChunkTokens.0) as bigint) AS sub
      |       FROM c),
      | ch AS (SELECT doc_id, nat, sub, min(pos) AS start_tok,
      |         cast(count(*) as bigint) AS n_tok,
      |         string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      |        FROM r GROUP BY 1, 2, 3)""".stripMargin

  private def pinnedOccSql(col: String): String =
    pinnedMerges.map { case (l, r) =>
      val p = l + r
      s"\n    - (length($col) - length(replace($col, '$p', '')))//2"
    }.mkString

  private def duckList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")
}
