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

object TextExpressions {
  /** Codegen'd one-pass text statistics struct (see [[TokenTextStats]]).
    * `langMarkers` must be pre-sorted by language code — `lang_hits` follows
    * its order.
    */
  def token_text_stats(text: Column, langMarkers: Seq[(String, Seq[String])],
                       stopwords: Seq[String]): Column =
    ColumnShim.column(TokenTextStats(ColumnShim.expression(text), langMarkers, stopwords))
}
