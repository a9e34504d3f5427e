package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame

/** Content-defined chunking: golden equivalence against an independent
  * sequential reference implementation, the cover/partition invariants, and
  * the property the operator exists for — boundary realignment after edits
  * (fixed-stride chunking invalidates every chunk after an insertion; CDC
  * re-synchronizes at the first surviving boundary).
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val Div = 8 // denser boundaries than the query default, for small fixtures
  private val Cap = 16

  /** Independent reference: sequential, driver-side, java.security md5 —
    * shares no code with the Spark operator.
    */
  private def h15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Natural (content-defined) boundary positions of `text` — reference. */
  private def refBoundaries(text: String, k: Int = K, div: Int = Div): Seq[Int] = {
    val w = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    (k - 1).until(w.length - 1).filter { i =>
      h15(w.slice(i - k + 1, i + 1).mkString(" ")) % div == 0
    }
  }

  private def refChunks(text: String, k: Int = K, div: Int = Div, cap: Int = Cap): Seq[(Long, Long, String)] = {
    val w = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (w.isEmpty) return Seq.empty
    val bpos = refBoundaries(text, k, div)
    val naturalStarts = 0 +: bpos.map(_ + 1)
    val naturalEnds = naturalStarts.drop(1) :+ w.length
    val allStarts = naturalStarts.zip(naturalEnds).flatMap { case (s, e) => s.until(e, cap) }
    val allEnds = allStarts.drop(1) :+ w.length
    allStarts.zip(allEnds).zipWithIndex.map { case ((s, e), ci) =>
      (ci.toLong, s.toLong, w.slice(s, e).mkString(" "))
    }
  }

  private def sparkChunks(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, String)]] =
    TextAnalysis.cdcChunkDocuments(docs.toDF("doc_id", "text"), "doc_id", "text",
        windowK = K, divisor = Div, maxChunkTokens = Cap)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  private def corpus: Seq[(Long, String)] = {
    // Deterministic pseudo-text: enough variety that boundaries land at
    // div=8 density, plus degenerate shapes (empty, 1 token, == k tokens).
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(seed: Int, n: Int) =
      (0 until n).map(i => words((i * 7 + seed * 13 + i * i * 3) % words.length)).mkString(" ")
    Seq(1L -> doc(1, 120), 2L -> doc(2, 75), 3L -> doc(3, 200),
      4L -> "", 5L -> "solo", 6L -> "one two three")
  }

  test("golden: Spark chunking matches the sequential reference on every doc") {
    val got = sparkChunks(corpus)
    corpus.foreach { case (id, text) =>
      val exp = refChunks(text)
      assert(got.getOrElse(id, Seq.empty) == exp, s"doc $id")
    }
  }

  test("invariants: chunks partition the normalized text; lengths bounded by the cap") {
    val got = sparkChunks(corpus)
    corpus.filter(_._2.trim.nonEmpty).foreach { case (id, text) =>
      val chunks = got(id)
      assert(chunks.map(_._3).mkString(" ") == text.trim.split("\\s+").mkString(" "))
      assert(chunks.forall(_._3.split(" ").length <= Cap))
      // starts are consistent: each chunk's start equals the token count before it
      val starts = chunks.map(_._2)
      val cum = chunks.map(_._3.split(" ").length.toLong).scanLeft(0L)(_ + _).dropRight(1)
      assert(starts == cum)
    }
  }

  test("edit stability: after a prefix insertion, chunking realigns at the first surviving boundary") {
    val base = corpus.find(_._1 == 3L).get._2
    val edited = "inserted preamble words " + base
    val Seq(baseChunks, editChunks) =
      Seq(10L -> base, 11L -> edited).map(d => sparkChunks(Seq(d))(d._1))
    // Every base chunk from the first NATURAL-boundary-aligned chunk onward
    // must reappear verbatim in the edited doc's chunking: grams >= k tokens
    // past the edit are untouched, so all boundaries after the first
    // surviving one are shared, and forced cap-splits are chunk-relative.
    // (start_tok > 0 is NOT enough — chunk 1 may be a forced cap-split
    // inside natural chunk 0, whose absolute content shifts with the edit.)
    val naturalStarts = refBoundaries(base).map(_ + 1L).toSet
    val baseTail = baseChunks.map(_._3).drop(
      baseChunks.indexWhere(c => naturalStarts.contains(c._2)) match {
        case -1 => baseChunks.length; case i => i
      })
    assert(baseTail.nonEmpty, "fixture must produce at least one post-boundary chunk")
    val editTexts = editChunks.map(_._3)
    assert(editTexts.takeRight(baseTail.length) == baseTail)
    // The same insertion under fixed-stride chunking shifts EVERY chunk:
    // quantify the contrast (no fixed chunk text survives the edit).
    val fixedBase = TextAnalysis.chunkDocuments(Seq(10L -> base).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = Cap, overlapTokens = 0)
      .collect().map(_.getString(4)).toSeq
    val fixedEdit = TextAnalysis.chunkDocuments(Seq(11L -> edited).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = Cap, overlapTokens = 0)
      .collect().map(_.getString(4)).toSeq
    val fixedSurvivors = fixedBase.toSet.intersect(fixedEdit.toSet)
    val cdcSurvivors = baseChunks.map(_._3).toSet.intersect(editTexts.toSet)
    assert(cdcSurvivors.size > fixedSurvivors.size,
      s"CDC must preserve more chunks than fixed-stride (cdc=${cdcSurvivors.size}, fixed=${fixedSurvivors.size})")
  }

  test("real corpus: invariants hold and boundary density tracks the divisor") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").limit(200)
    val out = TextAnalysis.cdcChunkDocuments(docs, "doc_id", "text",
      windowK = 3, divisor = 32, maxChunkTokens = 128)
    val agg = out.groupBy("id").count()
    val nDocs = docs.filter(org.apache.spark.sql.functions.length(
      org.apache.spark.sql.functions.trim($"text")) > 0).count()
    assert(agg.count() == nDocs) // every non-empty doc chunks
    val lens = out.select($"n_tok").as[Long].collect()
    assert(lens.forall(l => l >= 1 && l <= 128))
    // mean chunk length should be within a loose band of the divisor
    val mean = lens.sum.toDouble / lens.length
    assert(mean > 8 && mean < 128, s"mean chunk length $mean out of band")
  }
}
