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
  * default [[PixelStatsDecoder]] is a REAL decoder for the uncompressed
  * public formats PPM (P6) and BMP (24-bit uncompressed) — header parse +
  * per-channel pixel statistics, no external codec libraries; a production
  * deployment swaps in javax.imageio/ffmpeg behind the same [[MediaDecoder]]
  * trait with no change to plan shape, schema, or partitioning.
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

  /** Full decode-outcome schema produced by [[extractImageFeaturesWithRejects]]:
    * every input row comes back out, undecodable payloads as `decode_ok =
    * false` rows with NULL features — the quarantine stream is DATA, never a
    * silent drop.
    */
  val imageDecodeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Pluggable decoder boundary. The default [[PixelStatsDecoder]] reads
    * real PPM/BMP payloads; a production implementation wraps
    * javax.imageio / ffmpeg for the compressed formats.
    */
  trait MediaDecoder extends Serializable {
    /** bytes → (width, height, embedding); None when the payload is not a
      * format this decoder reads (callers drop or route such rows).
      */
    def decodeImage(bytes: Array[Byte], embeddingDim: Int): Option[(Int, Int, Array[Float])]
  }

  /** Real decoder for the two classic UNCOMPRESSED public image formats:
    *
    *  - PPM "P6" (netpbm): ASCII header `P6 <w> <h> <maxval>` (whitespace-
    *    separated, `#` comments allowed) + one whitespace byte, then
    *    `w*h*3` raw RGB bytes (maxval ≤ 255 supported).
    *  - BMP, 24-bit uncompressed (BITMAPINFOHEADER): little-endian header,
    *    bottom-up BGR rows padded to 4-byte boundaries.
    *
    * The "embedding" is the per-channel pixel-statistics vector
    * `[r_sum, g_sum, b_sum, min, max, n_pixels, first, last]` (cycled or
    * zero-padded to `embeddingDim`) — every slot an exact small integer, so
    * features are bit-stable across engines and oracle-checkable.
    */
  object PixelStatsDecoder extends MediaDecoder {

    override def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
      parse(bytes).map { case (w, h, px) =>
        var r = 0L; var g = 0L; var b = 0L
        var mn = 256; var mx = -1
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xFF
          (i % 3: @annotation.switch) match {
            case 0 => r += v
            case 1 => g += v
            case 2 => b += v
          }
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        val n = px.length / 3
        val stats = Array[Float](r.toFloat, g.toFloat, b.toFloat,
          (if (n == 0) 0 else mn).toFloat, (if (n == 0) 0 else mx).toFloat,
          n.toFloat,
          (if (px.length == 0) 0 else px(0) & 0xFF).toFloat,
          (if (px.length == 0) 0 else px(px.length - 1) & 0xFF).toFloat)
        (w, h, Array.tabulate(dim)(i => if (i < stats.length) stats(i) else 0f))
      }

    /** (width, height, top-down RGB pixel bytes) or None if unreadable. */
    private def parse(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') parsePpm(bytes)
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
      else None

    private def parsePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      var pos = 2
      def nextInt(): Int = {
        // skip whitespace and '#'-to-EOL comments
        var done = false
        while (!done && pos < bytes.length) {
          val c = bytes(pos)
          if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0B || c == '\f') pos += 1
          else done = true
        }
        var v = 0
        var any = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        }
        if (any) v else -1
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      pos += 1 // the single whitespace byte after maxval
      val n = w.toLong * h * 3
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
          pos + n > bytes.length) None
      else Some((w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)))
    }

    private def parseBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      def le32(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
      def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      if (bytes.length < 54) return None
      val dataOff = le32(10)
      val w = le32(18)
      val hRaw = le32(22)
      val bpp = le16(28)
      val compression = le32(30)
      if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0) return None
      val h = math.abs(hRaw)
      val bottomUp = hRaw > 0
      val stride = ((w * 3 + 3) / 4) * 4
      if (dataOff.toLong + stride.toLong * h > bytes.length) return None
      val out = new Array[Byte](w * h * 3)
      var row = 0
      while (row < h) {
        val src = dataOff + (if (bottomUp) (h - 1 - row) else row) * stride
        var x = 0
        while (x < w) {
          // BGR on disk → RGB out
          out((row * w + x) * 3) = bytes(src + x * 3 + 2)
          out((row * w + x) * 3 + 1) = bytes(src + x * 3 + 1)
          out((row * w + x) * 3 + 2) = bytes(src + x * 3)
          x += 1
        }
        row += 1
      }
      Some((w, h, out))
    }
  }

  /** javax.imageio-backed decoder — the COMPRESSED public formats via the
    * JDK's built-in readers (PNG, JPEG, BMP, GIF, WBMP; zero external
    * codecs). Emits the SAME per-channel pixel-statistics vector as
    * [[PixelStatsDecoder]], channel values in R,G,B order per pixel, so a
    * LOSSLESS format (PNG) reproduces the uncompressed formats' stats
    * byte-for-byte (oracle-replayed by `media_png_features`); lossy JPEG is
    * gated on decode success + dimensions only. Headless-safe (no display
    * needed for ImageIO/BufferedImage).
    */
  object ImageIoDecoder extends MediaDecoder {
    override def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] = {
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      img.map { im =>
        val w = im.getWidth; val h = im.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var mn = 256; var mx = -1
        var first = 0; var last = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val rr = (rgb >> 16) & 0xFF; val gg = (rgb >> 8) & 0xFF; val bb = rgb & 0xFF
            r += rr; g += gg; b += bb
            if (rr < mn) mn = rr; if (gg < mn) mn = gg; if (bb < mn) mn = bb
            if (rr > mx) mx = rr; if (gg > mx) mx = gg; if (bb > mx) mx = bb
            if (x == 0 && y == 0) first = rr
            if (x == w - 1 && y == h - 1) last = bb
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val stats = Array[Float](r.toFloat, g.toFloat, b.toFloat,
          (if (n == 0) 0 else mn).toFloat, (if (n == 0) 0 else mx).toFloat,
          n.toFloat, first.toFloat, last.toFloat)
        (w, h, Array.tabulate(dim)(i => if (i < stats.length) stats(i) else 0f))
      }
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

  /** Batched decode over partitions, EVERY row accounted for: decodable
    * payloads become `decode_ok = true` feature rows, undecodable ones
    * `decode_ok = false` rows with NULL features — the quarantine stream a
    * real pipeline routes/counts instead of silently dropping (a corrupt
    * shard that decodes 0 rows must look different from an empty shard).
    *
    * Partition sizing is the scale lever: `targetPartitionBytes` bounds
    * decoder working-set per task (payloads are large; rows/partition must
    * track bytes, not row count). A 100 TB corpus at 256 MB per partition is
    * ~400k tasks — fine for a 1000-executor cluster.
    */
  def extractImageFeaturesWithRejects(df: DataFrame, idCol: String, bytesCol: String,
                                      embeddingDim: Int = 16,
                                      decoder: MediaDecoder = PixelStatsDecoder,
                                      targetPartitionBytes: Long = 256L << 20): DataFrame = {
    val totalBytes = df.agg(sum(octet_length(col(bytesCol)))).head().getLong(0)
    val nParts = math.max(1, math.min(10000, (totalBytes / targetPartitionBytes) + 1).toInt)
    val slim = df.select(col(idCol).cast(LongType), col(bytesCol)).repartition(nParts)
    val enc = org.apache.spark.sql.Encoders.row(imageDecodeSchema)
    slim.mapPartitions { it =>
      // One decoder per partition — amortized init, batch-shaped like
      // mapInPandas batches.
      it.map { r =>
        decoder.decodeImage(r.getAs[Array[Byte]](1), embeddingDim) match {
          case Some((w, h, emb)) => Row(r.getLong(0), true, w, h, emb.toSeq)
          case None => Row(r.getLong(0), false, null, null, null)
        }
      }
    }(enc).toDF()
  }

  /** Feature extraction: the `decode_ok` rows of
    * [[extractImageFeaturesWithRejects]], features-only schema. Same single
    * mapPartitions plan plus a filter; callers that need the rejects as data
    * use the WithRejects form directly.
    */
  def extractImageFeatures(df: DataFrame, idCol: String, bytesCol: String,
                           embeddingDim: Int = 16,
                           decoder: MediaDecoder = PixelStatsDecoder,
                           targetPartitionBytes: Long = 256L << 20): DataFrame =
    extractImageFeaturesWithRejects(df, idCol, bytesCol, embeddingDim, decoder,
        targetPartitionBytes)
      .filter(col("decode_ok"))
      .select(col("media_id"), col("width"), col("height"), col("embedding"))

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
