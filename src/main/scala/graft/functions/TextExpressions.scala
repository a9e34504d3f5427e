package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-row text statistics of the cleaning pipeline in ONE compiled
  * pass: char/punctuation counts, whitespace token count, stopword hits,
  * and per-language marker hits. The higher-order formulation it replaces
  * (`size(filter(tokens, t => array_contains(markers, t)))` × L languages,
  * plus the stopword filter and a regexp_replace) evaluates interpreted
  * lambda machinery per (token × language) and re-tokenizes per consumer —
  * it dominated `pipeline_clean_corpus`.
  *
  * Value-compatible with the expression tree it replaces (the DuckDB oracle
  * replays that tree, so this must match bit-for-bit):
  *  - `n_chars`  = `length(text)` (codepoints);
  *  - `punct_chars` = codepoints removed by `regexp_replace(text,
  *    "[\\p{Punct}]", "")` — Java's ASCII punct class;
  *  - tokens = `split(trim(lower(text)), "\\s+")`, empty when the trimmed
  *    text is empty (`trim` strips 0x20 only, like Spark's `trim`; token
  *    BOUNDARIES are case-insensitive so `n_tokens` equals the un-lowered
  *    count the pipeline uses);
  *  - `stop_hits` / `lang_hits(i)` = number of tokens contained in the
  *    stopword / language-i marker set (languages in sorted-code order).
  */
case class TokenTextStats(child: Expression, langMarkers: Seq[(String, Seq[String])],
                          stopwords: Seq[String])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = TokenTextStats.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_text_stats requires string, got $t")
    }

  /** token → bitmask: bit i = marker of language i; bit 31 = stopword. */
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langMarkers.zipWithIndex.foreach { case ((_, ws), i) =>
      ws.foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    stopwords.foreach { w =>
      m.merge(w, Integer.valueOf(1 << 31), (a, b) => Integer.valueOf(a | b))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TokenTextStats.compute(input.asInstanceOf[UTF8String], table, langMarkers.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("tokenStatsTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenTextStats.compute($c, $tRef, ${langMarkers.size});")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenTextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("punct_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("lang_hits", ArrayType(IntegerType, containsNull = false), nullable = false)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Java's \p{Punct}: !"#$%&'()*+,-./ :;<=>?@ [\]^_` {|}~ (ASCII only). */
  @inline private def isPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)

  /** Static helper shared by interpreted eval and generated code. */
  def compute(s: UTF8String, table: java.util.HashMap[String, Integer],
              nLangs: Int): InternalRow = {
    // Char + punct counts over the ORIGINAL text (codepoints, like length()).
    val str = s.toString
    var nChars = 0
    var punct = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (isPunct(cp)) punct += 1
      i += Character.charCount(cp)
    }
    // Tokens over trim(lower(text)) — UTF8String.toLowerCase/trim are the
    // exact kernels behind Spark's lower()/trim().
    val trimmed = s.toLowerCase.trim()
    var nTokens = 0
    var stop = 0
    val hits = new Array[Int](nLangs)
    if (trimmed.numChars() > 0) {
      val toks = Ws.split(trimmed.toString, -1)
      nTokens = toks.length
      var j = 0
      while (j < toks.length) {
        val m = table.get(toks(j))
        if (m != null) {
          val mask = m.intValue()
          if ((mask & (1 << 31)) != 0) stop += 1
          var l = 0
          while (l < nLangs) {
            if ((mask & (1 << l)) != 0) hits(l) += 1
            l += 1
          }
        }
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, punct, nTokens, stop, new GenericArrayData(hits)))
  }
}

/** CDC chunk-boundary positions in ONE compiled pass over the token array —
  * the positions `i ∈ [windowK-1, n-2]` whose gram hash
  * `conv(substring(md5(concat_ws(" ", slice(toks, i-(windowK-2), windowK))), 1, 15), 16, 10)`
  * is ≡ 0 (mod divisor). The higher-order formulation it replaces
  * (`filter(sequence(...), i => md5-of-sliced-gram ...)`) evaluates the md5
  * chain through INTERPRETED lambda machinery per token position — slice
  * allocates a Catalyst array, concat_ws builds a UTF8String, md5 renders a
  * hex string, conv re-parses it — and dominated `dedup_cdc_chunks` /
  * `pipeline_cdc_chunk` (guide §4: keep hot per-row work codegen'd).
  *
  * Value-compatible with that tree bit-for-bit (the DuckDB oracle replays
  * it): the gram joins the k tokens with single spaces skipping nulls
  * (concat_ws semantics), the hash takes the md5 digest's first 15 hex
  * nibbles as the top 60 bits of the first 8 digest bytes, and n ≤ windowK
  * yields the empty array (the caller's `when(n > windowK, …)` guard).
  */
case class CdcBoundaries(child: Expression, windowK: Int, divisor: Int)
    extends UnaryExpression with Serializable {
  require(windowK > 0 && divisor > 0,
    s"need positive (windowK, divisor), got ($windowK, $divisor)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      windowK, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundaries.compute($c, $windowK, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  private val Space = Array[Byte](' ')

  /** Static helper shared by interpreted eval and generated code. */
  def compute(toks: org.apache.spark.sql.catalyst.util.ArrayData,
              windowK: Int, divisor: Int): GenericArrayData = {
    val n = toks.numElements()
    if (n <= windowK) return new GenericArrayData(Array.empty[Int])
    // Token bytes extracted ONCE per row (not once per position × k).
    val bytes = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      bytes(j) = if (toks.isNullAt(j)) null else toks.getUTF8String(j).getBytes
      j += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / divisor + 4)
    var i = windowK - 1
    while (i <= n - 2) {
      val start = i - windowK + 1 // 0-based first token of the gram
      md.reset()
      var first = true
      var g = start
      while (g <= i) {
        if (bytes(g) != null) { // concat_ws skips nulls, no separator
          if (!first) md.update(Space)
          md.update(bytes(g))
          first = false
        }
        g += 1
      }
      val d = md.digest()
      // First 15 hex nibbles == top 60 bits of the first 8 digest bytes.
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = v >>> 4
      if (v % divisor == 0) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object TextExpressions {
  /** Codegen'd one-pass text statistics struct (see [[TokenTextStats]]).
    * `langMarkers` must be pre-sorted by language code — `lang_hits` follows
    * its order.
    */
  def token_text_stats(text: Column, langMarkers: Seq[(String, Seq[String])],
                       stopwords: Seq[String]): Column =
    ColumnShim.column(TokenTextStats(ColumnShim.expression(text), langMarkers, stopwords))

  /** Codegen'd CDC boundary scan (see [[CdcBoundaries]]). */
  def cdc_boundaries(tokens: Column, windowK: Int, divisor: Int): Column =
    ColumnShim.column(CdcBoundaries(ColumnShim.expression(tokens), windowK, divisor))
}
