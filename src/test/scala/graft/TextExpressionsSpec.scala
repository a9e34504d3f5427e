package graft

import graft.functions.TextExpressions
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** TokenTextStats must be value-identical to the higher-order expression
  * tree it replaced (the clean-corpus oracle replays that tree in DuckDB).
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val langs = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val toksLower = TextAnalysis.tokens(lower(col("text")))
    val hofScores = langs.map { case (l, ws) =>
      val sw = array(ws.map(lit): _*)
      size(filter(toksLower, t => array_contains(sw, t))).as(s"hof_$l")
    }
    val st = TextExpressions.token_text_stats(col("text"), langs,
      TextAnalysis.EnglishStopwords).as("st")
    val both = df.select(Seq(col("text"), st,
      length(col("text")).as("hof_chars"),
      (length(col("text")) - length(regexp_replace(col("text"), "[\\p{Punct}]", "")))
        .as("hof_punct"),
      TextAnalysis.tokenCount(col("text")).as("hof_toks"),
      size(filter(toksLower,
        t => array_contains(array(TextAnalysis.EnglishStopwords.map(lit): _*), t)))
        .as("hof_stop")) ++ hofScores: _*)
    both.collect().foreach { r =>
      val s = r.getStruct(r.fieldIndex("st"))
      val tag = r.getString(0).take(40)
      assert(s.getInt(0) == r.getAs[Int]("hof_chars"), s"n_chars [$tag]")
      assert(s.getInt(1) == r.getAs[Int]("hof_punct"), s"punct [$tag]")
      assert(s.getInt(2) == r.getAs[Int]("hof_toks"), s"n_tokens [$tag]")
      assert(s.getInt(3) == r.getAs[Int]("hof_stop"), s"stop [$tag]")
      val hits = s.getSeq[Int](4)
      langs.zipWithIndex.foreach { case ((l, _), i) =>
        assert(hits(i) == r.getAs[Int](s"hof_$l"), s"lang $l [$tag]")
      }
    }
  }

  test("token_text_stats matches the HOF tree on edge cases") {
    compare(Seq(
      "", " ", "   ", "the quick brown fox and the dog",
      "THE And OF", "der die das und ist", "  leading and trailing  ",
      "tabs\tand\nnewlines the", "punct!!! ...and, (more); the?",
      "a", "the", "不 是 的 人", "mixed 的 the und le el",
      "éàü unicode tokens the", "double  spaces   the").toDF("text"))
  }

  test("token_text_stats matches the HOF tree on the sf0.001 corpus") {
    compare(spark.read.parquet(s"$sf001/documents.parquet").select("text"))
  }

  /** The interpreted simhash fold the compiled SimHashSig replaced —
    * replayed verbatim as the golden reference.
    */
  private def simhashFold(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = TextAnalysis.tokens(text)
    def bitsOf(w: org.apache.spark.sql.Column) = {
      val h = xxhash64(w)
      array((0 until 64).map(i =>
        when(shiftright(h, i).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))): _*)
    }
    val counts = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, w) => zip_with(acc, bitsOf(w), (a, b) => a + b))
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(counts, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  private def compareSimhash(df: org.apache.spark.sql.DataFrame): Unit = {
    val both = df.select(col("text"),
      graft.ops.Dedup.simhash(col("text")).as("compiled"),
      simhashFold(col("text")).as("golden"))
    both.collect().foreach { r =>
      val tag = Option(r.getString(0)).map(_.take(40)).getOrElse("<null>")
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch [$tag]")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"simhash mismatch [$tag]")
    }
  }

  test("simhash_sig is bit-identical to the interpreted fold on edge cases") {
    compareSimhash(Seq(
      "", " ", "a", "the quick brown fox", "the the the",
      "punct!!! and, (more); the?", "不 是 的 人", "éàü unicode tokens",
      "tabs\tand\nnewlines", "x " * 500).toDF("text"))
    // null text → null simhash, like the fold over a null token array
    compareSimhash(Seq[Option[String]](None, Some("y"))
      .toDF("text"))
  }

  test("simhash_sig is bit-identical to the interpreted fold on the sf0.001 corpus") {
    compareSimhash(spark.read.parquet(s"$sf001/documents.parquet").select("text"))
  }

  /** The higher-order tree [[graft.functions.CdcBoundaries]] replaced —
    * evaluated side by side, it must match bit-for-bit (same md5-derived
    * gram hash, same concat_ws null skipping, same n ≤ k empty guard).
    */
  private def hofBoundaries(toks: org.apache.spark.sql.Column, k: Int,
                            div: Int): org.apache.spark.sql.Column = {
    val n = size(toks)
    def gramHash(i: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws(" ", slice(toks, i - (k - 2), lit(k)))), 1, 15),
        16, 10).cast("long")
    when(n > k, filter(sequence(lit(k - 1), n - 2), i => gramHash(i) % div === 0))
      .otherwise(array().cast("array<int>"))
  }

  test("cdc_boundaries is bit-identical to the higher-order md5 tree") {
    val docs = Seq(
      "", "a", "a b", "a b c", "a b c d",
      "the quick brown fox jumps over the lazy dog " * 30,
      "x " * 400, "éàü unicode tokens here and more of them repeated " * 10
    ).toDF("text").select(split(trim(col("text")), "\\s+").as("toks"))
    // plus a null-element array (concat_ws skips nulls without a separator)
    val withNulls = Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"), lit("d"),
        lit("e")).as("toks"))
    Seq((3, 8), (3, 32), (5, 4)).foreach { case (k, div) =>
      docs.unionByName(withNulls).select(
          graft.functions.TextExpressions.cdc_boundaries(col("toks"), k, div)
            .as("compiled"),
          hofBoundaries(col("toks"), k, div).as("golden"))
        .collect().foreach { r =>
          assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"(k=$k, div=$div)")
        }
    }
  }
}
