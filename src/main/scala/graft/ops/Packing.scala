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

  /** Distributed EXACT global row numbering in deterministic
    * `(hashBucket(id), id)` order — the scale-safe replacement for a
    * single-partition `row_number() OVER (ORDER BY …)`: rows hash into
    * `nBuckets` ranges of the same leading sort key, a first pass counts
    * each bucket (nBuckets longs to the driver — the only driver state),
    * prefix sums become per-bucket offsets, and a window PARTITIONED BY
    * bucket numbers within. Because the bucket is a prefix of the order
    * key, `offset(bucket) + within-bucket rank` IS the global rank; every
    * window sort runs parallel and ~n/nBuckets-sized. Two jobs, one
    * shuffle each.
    */
  def globalRowNumber(df: DataFrame, idCol: String, nBuckets: Int = 100): DataFrame = {
    require(nBuckets > 0 && 10000 % nBuckets == 0,
      s"nBuckets must divide the 10^4 hash-bucket space, got $nBuckets")
    val width = 10000 / nBuckets
    val withB = df
      .withColumn("__hb", Sampling.hashBucket(col(idCol)))
      .withColumn("__b", floor(col("__hb") / width).cast("int"))
    val counts = withB.groupBy("__b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nBuckets)
      .scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val offsetOf = element_at(
      array((0 until nBuckets).map(i => lit(offsets(i))): _*), col("__b") + 1)
    val w = Window.partitionBy("__b").orderBy(col("__hb"), col(idCol))
    withB.withColumn("rn", offsetOf + row_number().over(w))
      .drop("__hb", "__b")
  }

  /** Training-shard manifest: rows take consecutive `shardSize`-row shards
    * in the deterministic global order of [[globalRowNumber]], and each
    * shard reports the summary a downstream loader checks before reading —
    * row count, payload size, first/last id in shard order, id checksum.
    * The writer-side counterpart is `df.withColumn("shard_id", …)
    * .write.partitionBy("shard_id")`; the manifest is what makes that
    * export auditable.
    */
  def shardManifest(df: DataFrame, idCol: String, sizeCol: String,
                    shardSize: Int, nBuckets: Int = 100): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    globalRowNumber(df, idCol, nBuckets)
      .withColumn("shard_id", floor((col("rn") - 1) / shardSize).cast("long"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_size"),
        min_by(col(idCol), col("rn")).as("first_id"),
        max_by(col(idCol), col("rn")).as("last_id"),
        sum(col(idCol)).as("id_sum"))
  }
}
