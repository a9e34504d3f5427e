package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: concatenate documents into a contiguous token stream
  * and split it into fixed `seqLen` training windows (the GPT-pretraining
  * pack-and-chunk). Deterministic — the stream order is `orderCol` within
  * each shard — so both engines (and reruns) produce identical chunks.
  *
  * Plan shape: one window cumsum gives each doc its stream offset; a doc
  * spanning chunks `[offset/L, (offset+n-1)/L]` explodes into one row per
  * covered chunk with its in-chunk token count. No joins, one shuffle (the
  * window partition key).
  *
  * Scale: a single global ordering would serialize the cumsum; `shardCol`
  * (source / shard id) keeps packing embarrassingly parallel per shard —
  * exactly how a 100 TB corpus is packed in practice (per input shard),
  * at the cost of one partial chunk per shard tail.
  */
object Packing {

  /** Per-(doc, chunk) coverage rows: `(…, offset, chunk_id,
    * n_tokens_in_chunk)`. Zero-token docs occupy no chunk and are dropped
    * (after offsets are assigned, so they don't shift the stream).
    */
  def packChunks(docs: DataFrame, orderCol: String, nTokensCol: String,
                 seqLen: Int, shardCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = shardCol.fold(Window.partitionBy())(sc => Window.partitionBy(sc))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("offset", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .filter(col(nTokensCol) > 0)
      .withColumn("chunk_id", explode(sequence(
        floor(col("offset") / seqLen),
        floor((col("offset") + col(nTokensCol) - 1) / seqLen))))
      .withColumn("n_tokens_in_chunk",
        least(col("offset") + col(nTokensCol), (col("chunk_id") + 1) * seqLen) -
          greatest(col("offset"), col("chunk_id") * seqLen))
  }

  /** Chunk-level fill stats: docs touching each chunk and its token fill
    * (== seqLen everywhere but each shard's tail chunk).
    */
  def chunkStats(docs: DataFrame, orderCol: String, nTokensCol: String,
                 seqLen: Int, shardCol: Option[String] = None): DataFrame = {
    val packed = packChunks(docs, orderCol, nTokensCol, seqLen, shardCol)
    packed.groupBy(shardCol.map(col).toSeq :+ col("chunk_id"): _*)
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens_in_chunk").as("n_tokens"))
  }
}
