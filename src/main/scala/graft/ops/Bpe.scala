package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * "train a tokenizer on the corpus" job of an LLM data pipeline, where
  * [[TextAnalysis.approxBpeTokenCount]] only estimates token counts.
  *
  * Scale design: the corpus-sized shuffle happens ONCE (the word-frequency
  * groupBy); every training iteration then runs over the compacted
  * word-frequency table — |distinct words| rows, orders of magnitude
  * smaller than the corpus and exactly the state classic word-level BPE
  * iterates on. Per iteration: one pair-count aggregate (map-side
  * combined) and one `take(1)` argmax reduce; only the winning pair (two
  * strings) ever reaches the driver, like the centroid collects of the ANN
  * family. The learned merge list (vocabSize-bounded, KB-sized) is the
  * model — it broadcasts into [[graft.functions.BpeEncode]] for the
  * corpus-scale encode pass, which is a compiled map-only expression.
  */
object Bpe {

  /** The word-frequency symbol table training iterates on:
    * `(syms: array<string>, cnt)` — one row per distinct word, chars split.
    */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(filter(split(col("w"), ""), s => length(s) > 0).as("syms"),
        col("cnt"))

  /** Learn up to `nMerges` merges; stops early when the best remaining
    * pair's weighted count drops below `minPairCount`. Deterministic:
    * ties break by (left, right) binary string order. Returns merges in
    * rank order (earlier = higher priority at encode time).
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minPairCount: Long = 2L, checkpointEvery: Int = 8): Seq[(String, String)] = {
    require(nMerges >= 0 && minPairCount >= 1 && checkpointEvery >= 1)
    var cur = wordFrequencies(df, textCol).localCheckpoint(true)
    var lastCkpt = cur
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var stop = false
      while (merges.size < nMerges && !stop) {
        val top = cur.filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(transform(
              sequence(lit(0), size(col("syms")) - 2),
              j => struct(element_at(col("syms"), j + 1).as("l"),
                element_at(col("syms"), j + 2).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .take(1)
        if (top.isEmpty || top(0).getLong(2) < minPairCount) stop = true
        else {
          val (l, r) = (top(0).getString(0), top(0).getString(1))
          merges += ((l, r))
          // apply the merge to every word: greedy left-to-right fold (the
          // rule BpeEncode replays); try_element_at keeps the empty-acc
          // probe null-safe under ANSI
          cur = cur.withColumn("syms", mergeOnce(col("syms"), l, r))
          if (merges.size % checkpointEvery == 0) {
            // checkpoint to cut the per-iteration lambda tree's lineage,
            // releasing the previous round's blocks (Cluster.scala pattern)
            val next = cur.localCheckpoint(true)
            Caching.release(lastCkpt)
            lastCkpt = next
            cur = next
          }
        }
      }
      merges.toSeq
    } finally Caching.release(lastCkpt)
  }

  /** One merge application: every adjacent `(l, r)` becomes `lr`, greedy
    * left-to-right (a freshly merged symbol never re-pairs with the same
    * scan — "aaa" + (a,a) → [aa, a]).
    */
  private[ops] def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Encode a whitespace-token array with a trained merge list (compiled
    * expression; see [[graft.functions.BpeEncode]]).
    */
  def encode(words: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeEncode.bpe_encode(words, merges)
}
