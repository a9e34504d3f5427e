package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of a word array against a trained merge table (see
  * `graft.ops.Bpe.train`): each word is split into codepoints and the
  * lowest-rank adjacent pair present is merged (all occurrences, greedy
  * left-to-right — the same application rule training uses), repeated until
  * no learned pair remains; outputs are flattened across words in order, so
  * `concat_ws("", result)` always equals `concat_ws("", words)` (the
  * roundtrip invariant the oracle pins). Words containing symbols never
  * seen in training simply stop merging early — unseen input degrades to
  * finer segmentation, never to failure.
  *
  * A compiled expression rather than a higher-order-function tree because
  * the per-word loop (rescan for the best rank after every merge) is
  * iterative-until-fixpoint — not expressible as one fold — and this sits
  * on the per-row hot path of corpus tokenization, exactly where the
  * interpreted-lambda cost dominated before `MinHashSig`/`TokenTextStats`.
  * The merge-rank table rides along as a codegen reference object, the
  * per-executor analog of a broadcast model (like the IVF centroid arrays).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode requires array<string>, got $t")
  }

  /** "l\u0000r" → rank (lower = earlier-learned = higher priority). */
  // Separator below is the escaped backslash-u0000 literal, never a raw
  // NUL byte, so this source file stays plain text for diff/blame.
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + "\u0000" + r, Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encodeAll(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.encodeAll($c, $rRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** Static kernel shared by interpreted eval and generated code. */
  def encodeAll(words: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) encodeWord(w.toString, ranks, out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  private def encodeWord(w: String, ranks: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    // Split into codepoints (matches training's char split on this data;
    // training itself splits code units — identical for non-supplementary
    // text, and any divergence only yields finer segments, preserving the
    // roundtrip invariant).
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      syms.add(w.substring(i, i + cc))
      i += cc
    }
    var done = syms.size < 2
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Integer.MAX_VALUE
      var bl: String = null
      var br: String = null
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bl = syms.get(j); br = syms.get(j + 1)
        }
        j += 1
      }
      if (bl == null) done = true
      else {
        // merge every (bl, br) occurrence, greedy left-to-right — the same
        // rule the training fold applies, so encode replays training exactly
        val ns = new java.util.ArrayList[String](syms.size)
        val merged = bl + br
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == bl && syms.get(k + 1) == br) {
            ns.add(merged); k += 2
          } else {
            ns.add(syms.get(k)); k += 1
          }
        }
        syms = ns
        done = syms.size < 2
      }
    }
    var m = 0
    while (m < syms.size) { out.add(UTF8String.fromString(syms.get(m))); m += 1 }
  }

  /** Column API: BPE-encode an `array<string>` of words. */
  def bpe_encode(words: Column, merges: Seq[(String, String)]): Column =
    ColumnShim.column(BpeEncode(ColumnShim.expression(words), merges))
}
