package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The Spark-side shape is real — schemas, partition sizing, per-partition
  * batched decode via `mapPartitions` (the Scala analog of `mapInPandas`:
  * one iterator per partition, decoder amortized across the batch). The
  * actual codec is STUBBED behind [[MediaDecoder]] with a deterministic fake
  * (image/audio libraries are not available in this environment); swapping in
  * a real decoder changes no plan shape, no schema, no partitioning.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Decoded-image feature schema produced by [[extractImageFeatures]]. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Pluggable decoder boundary. A real implementation wraps javax.imageio /
    * ffmpeg; the default is a deterministic fake so plumbing is testable.
    */
  trait MediaDecoder extends Serializable {
    /** bytes → (width, height, embedding). */
    def decodeImage(bytes: Array[Byte], embeddingDim: Int): (Int, Int, Array[Float])
  }

  /** Deterministic fake: dimensions and embedding are splitmix64-mixed
    * functions of the payload bytes — stable across runs and engines.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    override def decodeImage(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
      var h = 0x100000001b3L
      var i = 0
      while (i < bytes.length) { h = mix(h ^ bytes(i)); i += 1 }
      val w = 64 + (mix(h) & 0x3FF).toInt          // 64..1087 px
      val ht = 64 + (mix(h + 1) & 0x3FF).toInt
      val emb = Array.tabulate(dim)(d => (mix(h + 2 + d).toFloat / Long.MaxValue.toFloat))
      (w, ht, emb)
    }
  }

  /** Wrap a binary payload column into (payload, meta) — the ingest step.
    * Pure expressions: metadata derives from the bytes (cheap, codegen'd).
    */
  def withMediaMeta(df: DataFrame, bytesCol: String, mediaType: String,
                    format: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mediaType).as("media_type"),
      lit(format).as("format"),
      octet_length(col(bytesCol)).cast(LongType).as("n_bytes"),
      md5(col(bytesCol)).as("checksum")))

  /** Batched decode + feature extraction over partitions.
    *
    * Partition sizing is the scale lever: `targetPartitionBytes` bounds
    * decoder working-set per task (payloads are large; rows/partition must
    * track bytes, not row count). A 100 TB corpus at 256 MB per partition is
    * ~400k tasks — fine for a 1000-executor cluster.
    */
  def extractImageFeatures(df: DataFrame, idCol: String, bytesCol: String,
                           embeddingDim: Int = 16,
                           decoder: MediaDecoder = DeterministicFakeDecoder,
                           targetPartitionBytes: Long = 256L << 20): DataFrame = {
    val spark = df.sparkSession
    val totalBytes = df.agg(sum(octet_length(col(bytesCol)))).head().getLong(0)
    val nParts = math.max(1, math.min(10000, (totalBytes / targetPartitionBytes) + 1).toInt)
    val slim = df.select(col(idCol).cast(LongType), col(bytesCol)).repartition(nParts)
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    slim.mapPartitions { it =>
      // One decoder per partition — amortized init, batch-shaped like
      // mapInPandas batches.
      it.map { r =>
        val (w, h, emb) = decoder.decodeImage(r.getAs[Array[Byte]](1), embeddingDim)
        Row(r.getLong(0), w, h, emb.toSeq)
      }
    }(enc).toDF()
  }

  /** Frame sampling for video payloads: emit `n` deterministic byte-slices
    * ("frames") per payload. Real impl would seek keyframes; the slicing,
    * explode shape, and output schema are the production plumbing.
    */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String, n: Int): DataFrame = {
    val len = octet_length(col(bytesCol))
    val stride = floor(len.cast(DoubleType) / n).cast(IntegerType)
    val frames = transform(sequence(lit(0), lit(n - 1)), i => struct(
      i.as("frame_no"),
      col(bytesCol).substr(i * stride + 1, greatest(lit(1), stride)).as("frame_bytes")))
    df.select(col(idCol), explode(frames).as("frame"))
      .select(col(idCol), col("frame.frame_no"), col("frame.frame_bytes"))
  }

  /** "Resize": deterministic thumbnail stub — truncate payload to a byte
    * budget and restamp metadata. Plan shape (projection, no shuffle)
    * matches a real resize.
    */
  def resizeStub(df: DataFrame, bytesCol: String, maxBytes: Int): DataFrame =
    df.withColumn(bytesCol,
      when(octet_length(col(bytesCol)) > maxBytes,
        substring(col(bytesCol), 1, maxBytes)).otherwise(col(bytesCol)))
}
