package graft

import graft.ops.Bpe
import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Golden-reference suite for the BPE tokenizer: `Bpe.train` and the
  * compiled `BpeEncode` are checked against an INDEPENDENT interpreted
  * implementation written directly from the word-level BPE spec
  * (Sennrich et al. 2016) — count adjacent symbol pairs weighted by word
  * frequency, merge the most frequent everywhere (ties by (l, r) order),
  * repeat; encode replays merges lowest-rank-first until fixpoint.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference implementation (driver-side, no Spark) ----

  private def refWordFreq(corpus: Seq[String]): Map[Seq[String], Long] =
    corpus.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toSeq, ws.size.toLong)
      }

  private def refMergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.size) {
      if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private def refTrain(corpus: Seq[String], nMerges: Int,
                       minPairCount: Long = 2L): Seq[(String, String)] = {
    var freq = refWordFreq(corpus)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.size < nMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      freq.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minPairCount) stop = true
        else {
          merges += ((l, r))
          freq = freq.toSeq.map { case (syms, cnt) =>
            refMergeOnce(syms, l, r) -> cnt
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        }
      }
    }
    merges.toSeq
  }

  private def refEncodeWord(w: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString)
    var done = syms.size < 2
    while (!done) {
      val present = syms.sliding(2).collect {
        case Seq(a, b) if ranks.contains((a, b)) => ((a, b), ranks((a, b)))
      }.toSeq
      if (present.isEmpty) done = true
      else {
        val (l, r) = present.minBy(_._2)._1
        syms = refMergeOnce(syms, l, r)
        done = syms.size < 2
      }
    }
    syms
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = merges.zipWithIndex.toMap
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(refEncodeWord(_, ranks))
  }

  // ---- train ----

  test("train matches the reference trainer on a classic corpus") {
    val corpus = Seq(
      "low low low low low lower lower newest newest newest newest newest newest widest widest widest",
      "low lower newest widest new new new")
    val expected = refTrain(corpus, nMerges = 12)
    val got = Bpe.train(corpus.toDF("text"), "text", nMerges = 12)
    assert(got == expected)
    assert(got.nonEmpty && got.size <= 12)
  }

  test("train tie-break is deterministic by (l, r) order") {
    // "ab" and "cd" both occur exactly twice; (a,b) < (c,d) must win first.
    val corpus = Seq("ab ab cd cd")
    val got = Bpe.train(corpus.toDF("text"), "text", nMerges = 2)
    assert(got == Seq(("a", "b"), ("c", "d")))
  }

  test("train stops below minPairCount") {
    val got = Bpe.train(Seq("xy yz zx").toDF("text"), "text",
      nMerges = 8, minPairCount = 2)
    assert(got.isEmpty) // every pair occurs once
  }

  // ---- encode: compiled expression vs reference, and invariants ----

  test("compiled BpeEncode matches the reference encoder on the corpus") {
    val docs = Registry.table(spark, sf001, "documents").limit(200).cache()
    try {
      val merges = Bpe.train(docs, "text", nMerges = 16)
      val rows = docs.select(col("text"),
          Bpe.encode(graft.ops.TextAnalysis.tokens(col("text")), merges).as("enc"))
        .as[(String, Seq[String])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (text, enc) =>
        assert(enc == refEncode(text, merges), s"mismatch for: $text")
      }
    } finally docs.unpersist()
  }

  test("roundtrip: concatenated encode equals concatenated words") {
    val docs = Registry.table(spark, sf001, "documents")
    val merges = Bpe.train(docs, "text", nMerges = 16)
    val words = graft.ops.TextAnalysis.tokens(col("text"))
    val bad = docs.filter(
      concat_ws("", Bpe.encode(words, merges)) =!= concat_ws("", words)).count()
    assert(bad == 0L)
  }

  test("char-disjoint pinned merges reduce counts by exact substring occurrences") {
    val pinned = Seq("t" -> "a", "r" -> "o", "l" -> "u", "s" -> "c")
    val docs = Registry.table(spark, sf001, "documents")
    val words = graft.ops.TextAnalysis.tokens(col("text"))
    val occ = pinned.map { case (l, r) =>
      (length(col("text")) - length(regexp_replace(col("text"),
        java.util.regex.Pattern.quote(l + r), ""))) / 2
    }.reduce(_ + _)
    val bad = docs.filter(
      size(Bpe.encode(words, pinned)).cast("long") =!=
        (length(concat_ws("", words)) - occ).cast("long")).count()
    assert(bad == 0L)
  }

  test("unseen symbols degrade to finer segmentation, never failure") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val out = Seq("abc xyz ab état").toDF("text")
      .select(Bpe.encode(graft.ops.TextAnalysis.tokens(col("text")), merges).as("e"))
      .as[Seq[String]].head()
    assert(out == Seq("abc", "x", "y", "z", "ab", "é", "t", "a", "t"))
  }
}
