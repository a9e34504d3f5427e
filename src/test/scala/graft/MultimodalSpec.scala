package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.PixelStatsDecoder
import org.apache.spark.sql.functions._

/** The real PPM/BMP decoder: same pixels through either container must
  * produce identical dimensions and statistics, and junk must be rejected
  * (dropped by the plumbing, not crashed on).
  */
class MultimodalSpec extends SparkSpec {

  // 2×2 RGB, top-down: (1,2,3) (4,5,6) / (7,8,9) (10,11,12)
  private val ppm: Array[Byte] =
    "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)

  private val bmp: Array[Byte] = {
    val header = new Array[Byte](54)
    header(0) = 'B'; header(1) = 'M'
    def le32(o: Int, v: Int): Unit = {
      header(o) = (v & 0xFF).toByte; header(o + 1) = ((v >> 8) & 0xFF).toByte
      header(o + 2) = ((v >> 16) & 0xFF).toByte; header(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    le32(2, 54 + 16); le32(10, 54); le32(14, 40)
    le32(18, 2); le32(22, 2) // bottom-up
    header(26) = 1; header(28) = 24 // planes, bpp
    // bottom-up BGR rows, stride 8: row1 (7,8,9)(10,11,12), row0 (1,2,3)(4,5,6)
    header ++ Array[Byte](9, 8, 7, 12, 11, 10, 0, 0, 3, 2, 1, 6, 5, 4, 0, 0)
  }

  private val expected = (2, 2, Array[Float](22f, 26f, 30f, 1f, 12f, 4f, 1f, 12f))

  test("PPM P6 decode: header parse + channel stats") {
    val Some((w, h, emb)) = PixelStatsDecoder.decodeImage(ppm, 8)
    assert((w, h) == (2, 2) && emb.toSeq == expected._3.toSeq, emb.toSeq.toString)
  }

  test("PPM with comments and multi-digit dims") {
    val img = ("P6\n# a comment\n3 1\n# more\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90))
    val Some((w, h, emb)) = PixelStatsDecoder.decodeImage(img, 8)
    assert((w, h) == (3, 1))
    assert(emb.toSeq == Seq(120f, 150f, 180f, 10f, 90f, 3f, 10f, 90f), emb.toSeq.toString)
  }

  test("BMP 24bpp bottom-up decode matches the PPM of the same pixels") {
    val Some((w, h, emb)) = PixelStatsDecoder.decodeImage(bmp, 8)
    assert((w, h) == (2, 2) && emb.toSeq == expected._3.toSeq, emb.toSeq.toString)
  }

  test("junk and truncated payloads are rejected, and the plumbing drops them") {
    assert(PixelStatsDecoder.decodeImage("not an image".getBytes, 8).isEmpty)
    assert(PixelStatsDecoder.decodeImage(ppm.dropRight(3), 8).isEmpty) // short pixels
    assert(PixelStatsDecoder.decodeImage(Array[Byte](), 8).isEmpty)
    val df = spark.createDataFrame(Seq(
      (1L, ppm), (2L, "garbage".getBytes), (3L, bmp)))
      .toDF("media_id", "payload")
    val out = Multimodal.extractImageFeatures(df, "media_id", "payload", embeddingDim = 8)
      .select("media_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 3L))
  }

  test("embeddingDim above the stats length zero-pads") {
    val Some((_, _, emb)) = PixelStatsDecoder.decodeImage(ppm, 12)
    assert(emb.length == 12 && emb.drop(8).forall(_ == 0f))
  }

  /** Encode the spec's 2×2 pixels to a real compressed container via the
    * JDK writer.
    */
  private def encode(format: String): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    var i = 0
    for (y <- 0 until 2; x <- 0 until 2) {
      im.setRGB(x, y, (px(i) << 16) | (px(i + 1) << 8) | px(i + 2)); i += 3
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, format, bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: PNG (lossless) reproduces the PPM stats exactly") {
    val Some((w, h, emb)) = Multimodal.ImageIoDecoder.decodeImage(encode("png"), 8)
    assert((w, h) == (2, 2) && emb.toSeq == expected._3.toSeq, emb.toSeq.toString)
  }

  test("ImageIoDecoder: JPEG (lossy) decodes with correct dimensions; junk rejected") {
    val Some((w, h, emb)) = Multimodal.ImageIoDecoder.decodeImage(encode("jpg"), 8)
    assert((w, h) == (2, 2) && emb(5) == 4f) // n_px exact even when values shift
    assert(Multimodal.ImageIoDecoder.decodeImage("not an image".getBytes, 8).isEmpty)
    assert(Multimodal.ImageIoDecoder.decodeImage(Array[Byte](), 8).isEmpty)
  }

  test("WAV PCM16: chunk walk, int16 sign, stats; junk and non-PCM rejected") {
    import graft.ops.Multimodal.WavPcmDecoder
    // Samples exercising sign handling: 100, -2 (0xFFFE), 32767, -32768.
    val pcm = Array[Byte](100, 0, 0xFE.toByte, 0xFF.toByte,
      0xFF.toByte, 0x7F.toByte, 0x00, 0x80.toByte)
    val wav = Multimodal.encodeWavPcm16(pcm, sampleRate = 8000, channels = 1)
    val Some(a) = WavPcmDecoder.decode(wav)
    assert(a == WavPcmDecoder.AudioStats(8000, 1, 4, 100L - 2 + 32767 - 32768,
      -32768, 32767, 100, -32768), a.toString)

    // Extra chunk between fmt and data must be walked over, not tripped on.
    val withList = wav.take(36) ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII") ++
      wav.drop(36)
    val Some(b) = WavPcmDecoder.decode(withList)
    assert(b == a)

    assert(WavPcmDecoder.decode("RIFFnope".getBytes).isEmpty)
    assert(WavPcmDecoder.decode(Array[Byte]()).isEmpty)
    assert(WavPcmDecoder.decode(wav.dropRight(3)).isEmpty) // truncated data chunk
    // Non-PCM format tag rejected.
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(WavPcmDecoder.decode(nonPcm).isEmpty)
  }

  test("extractAudioFeatures: quarantine contract (every row back, rejects flagged)") {
    val wav = Multimodal.encodeWavPcm16(Array[Byte](10, 0, 20, 0), 44100, 1)
    val df = spark.createDataFrame(Seq((1L, wav), (2L, "not audio".getBytes)))
      .toDF("media_id", "payload")
    val out = Multimodal.extractAudioFeatures(df, "media_id", "payload").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    assert(out == Seq((1L, true), (2L, false)))
  }

  test("resizeImages: pinned nearest-neighbor picks + PNG round-trip; junk quarantined") {
    // 4×2 source, pixel (x,y) has R=10x+y, G=100+x, B=200+y — every source
    // pixel identifiable. 2×2 nearest-neighbor: src(x,y) = (2x, y).
    val w = 4; val h = 2
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      px(i) = (10 * x + y).toByte; px(i + 1) = (100 + x).toByte; px(i + 2) = (200 + y).toByte
    }
    val src = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    val df = spark.createDataFrame(Seq((1L, src), (2L, "junk".getBytes)))
      .toDF("media_id", "payload")
    val out = Multimodal.resizeImages(df, "media_id", "payload", outW = 2, outH = 2)
    assert(out.count() == 2)
    assert(out.filter(!col("decode_ok")).select("media_id").head().getLong(0) == 2L)

    val ok = out.filter(col("decode_ok"))
    val Array(row) = ok.collect()
    assert(row.getInt(3) == 2 && row.getInt(4) == 2)
    // Decode the emitted PNG and check the EXACT picked pixels:
    // out(0,0)←src(0,0), out(1,0)←src(2,0), out(0,1)←src(0,1), out(1,1)←src(2,1).
    val png = row.getAs[Array[Byte]](2)
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    def rgb(x: Int, y: Int) = im.getRGB(x, y) & 0xFFFFFF
    def expect(sx: Int, sy: Int) = ((10 * sx + sy) << 16) | ((100 + sx) << 8) | (200 + sy)
    assert(rgb(0, 0) == expect(0, 0) && rgb(1, 0) == expect(2, 0) &&
      rgb(0, 1) == expect(0, 1) && rgb(1, 1) == expect(2, 1))
  }

  test("dHash: re-encode and exact NN upscale are Hamming-0; edits and strangers are far") {
    // 18×16 doc-seeded random image (grid-divisible: 18 = 9·2, 16 = 8·2, so
    // a 2× NN upscale pools the IDENTICAL pixel multiset per dHash cell).
    def ppmOf(seed: Long, w: Int, h: Int): Array[Byte] = {
      val rnd = new java.util.Random(seed)
      val px = new Array[Byte](w * h * 3)
      rnd.nextBytes(px)
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    }
    val orig = ppmOf(42L, 18, 16)
    val df = spark.createDataFrame(Seq((1L, orig))).toDF("media_id", "payload")
    // Clone: REAL resize (2× upscale) + PNG re-encode — different container,
    // dims, and bytes; same perceptual content.
    val clonePng = Multimodal.resizeImages(df, "media_id", "payload",
      outW = 36, outH = 32).head().getAs[Array[Byte]](2)
    val stranger = ppmOf(43L, 18, 16)
    val tooSmall = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ new Array[Byte](48)
    val all = spark.createDataFrame(Seq(
      (1L, orig), (2L, clonePng), (3L, stranger),
      (4L, "junk".getBytes), (5L, tooSmall))).toDF("media_id", "payload")
    val out = Multimodal.dHashImages(all, "media_id", "payload").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toMap
    assert(out(1)._1 && out(2)._1 && out(3)._1)
    // Sub-grid and undecodable payloads are quarantined, not hashed.
    assert(!out(4)._1 && !out(5)._1)
    assert(out(1)._2 == out(2)._2, "exact NN upscale + PNG re-encode must be Hamming 0")
    val strangerDist = java.lang.Long.bitCount(out(1)._2 ^ out(3)._2)
    assert(strangerDist > 10, s"unrelated images should be far apart, got $strangerDist")
    // LOCALITY: an edit confined to the top pooled-cell row (pixels y < 2)
    // can only move that row's 8 comparison bits — a perceptual hash, not
    // an avalanche hash. (A byte-level digest flips ~32 bits here.)
    val edited = orig.clone()
    val off = "P6\n18 16\n255\n".getBytes("US-ASCII").length
    for (i <- 0 until 18 * 2 * 3) edited(off + i) = 0 // blank rows y = 0, 1
    val df2 = spark.createDataFrame(Seq((9L, edited))).toDF("media_id", "payload")
    val editedHash = Multimodal.dHashImages(df2, "media_id", "payload").head().getLong(2)
    val editDist = java.lang.Long.bitCount(out(1)._2 ^ editedHash)
    assert(editDist <= 8, s"top-row edit must only touch row-0 bits, moved $editDist")
    assert(editDist < strangerDist)
    // End-to-end banding over {orig, clone, stranger}: exactly the planted
    // pair, at Hamming 0.
    val df3 = spark.createDataFrame(Seq((1L, orig), (2L, clonePng), (3L, stranger)))
      .toDF("media_id", "payload")
    val pairs = graft.ops.Dedup.hammingNearDups64(
      Multimodal.dHashImages(df3, "media_id", "payload"), "media_id", "dhash",
      maxHamming = 3).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSeq
    assert(pairs == Seq((1L, 2L, 0L)), pairs.toString)
  }

  test("audio envelope hash: repack and exact gain change are Hamming-0; strangers far; short/junk quarantined") {
    def pcmOf(seed: Long, n: Int): Array[Byte] = {
      val rnd = new java.util.Random(seed)
      val out = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (rnd.nextInt(32768) - 16384) & ~1 // even → exact halving below
        out(2 * i) = (v & 0xFF).toByte; out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      out
    }
    def halve(pcm: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](pcm.length)
      for (i <- 0 until pcm.length / 2) {
        val raw = (pcm(2 * i) & 0xFF) | ((pcm(2 * i + 1) & 0xFF) << 8)
        val v = (if (raw >= 0x8000) raw - 0x10000 else raw) / 2
        out(2 * i) = (v & 0xFF).toByte; out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      out
    }
    val pcm = pcmOf(7L, 260)
    val orig = Multimodal.encodeWavPcm16(pcm, 8000, 1)
    // Repack: junk LIST chunk between fmt and data, RIFF length patched.
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "junk".getBytes("US-ASCII")
    val repacked = orig.slice(0, 36) ++ junk ++ orig.slice(36, orig.length)
    val rl = repacked.length - 8
    repacked(4) = (rl & 0xFF).toByte; repacked(5) = ((rl >> 8) & 0xFF).toByte
    repacked(6) = ((rl >> 16) & 0xFF).toByte; repacked(7) = ((rl >> 24) & 0xFF).toByte
    val all = spark.createDataFrame(Seq(
      (1L, orig), (2L, repacked), (3L, Multimodal.encodeWavPcm16(halve(pcm), 8000, 1)),
      (4L, Multimodal.encodeWavPcm16(pcmOf(8L, 260), 8000, 1)),
      (5L, Multimodal.encodeWavPcm16(pcmOf(7L, 40), 8000, 1)), // < 65 samples
      (6L, "not a wav".getBytes))).toDF("media_id", "payload")
    val out = Multimodal.audioEnvelopeHash(all, "media_id", "payload").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toMap
    assert(out(1)._1 && out(2)._1 && out(3)._1 && out(4)._1)
    assert(!out(5)._1 && !out(6)._1, "sub-window and junk payloads quarantine")
    assert(out(1)._2 == out(2)._2, "container repack must be Hamming 0")
    assert(out(1)._2 == out(3)._2, "exact half-volume must be Hamming 0")
    val d = java.lang.Long.bitCount(out(1)._2 ^ out(4)._2)
    assert(d > 10, s"unrelated audio should be far apart, got $d")
  }

  test("videoFrameHashes: exact per-frame upscale matches all positions; one swapped frame matches n-1") {
    def framePx(seed: Long): Array[Byte] = {
      val rnd = new java.util.Random(seed)
      val px = new Array[Byte](18 * 16 * 3)
      rnd.nextBytes(px)
      px
    }
    def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    def up2x(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](4 * px.length)
      for (y <- 0 until 2 * h; x <- 0 until 2 * w; c <- 0 until 3)
        out((y * 2 * w + x) * 3 + c) = px(((y / 2) * w + (x / 2)) * 3 + c)
      out
    }
    val frames = (0 until 6).map(f => framePx(100 + f))
    val orig = frames.map(ppm(18, 16, _)).reduce(_ ++ _)
    val clone = frames.map(px => ppm(36, 32, up2x(px, 18, 16))).reduce(_ ++ _)
    // Same clip with its LAST sampled frame (pick 3 ← container frame 4)
    // replaced by unrelated content.
    val swapped = frames.updated(4, framePx(999)).map(ppm(18, 16, _)).reduce(_ ++ _)
    val df = spark.createDataFrame(Seq(
      (1L, orig), (2L, clone), (3L, swapped), (4L, "not frames".getBytes)))
      .toDF("media_id", "payload")
    val sig = Multimodal.videoFrameHashes(df, "media_id", "payload", n = 4)
    val ok = sig.filter(col("decode_ok")).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
    // Container-level junk quarantines as a single decode_ok=false row.
    assert(sig.filter(!col("decode_ok")).select("media_id").collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
    // picks over 6 frames at n=4: container frames 0, 1, 3, 4 → positions 0-3.
    (0 until 4).foreach { pos =>
      assert(ok((1L, pos)) == ok((2L, pos)), s"upscaled frame at pos $pos must hash equal")
    }
    val agree = (0 until 4).count(pos => ok((1L, pos)) == ok((3L, pos)))
    assert(agree == 3, s"one swapped sampled frame should cost exactly one position, agreed $agree")
  }

  test("concatenated-frame container: split, pinned sampling, per-frame decode, quarantine") {
    // Three 2×2 frames with distinct pixel bytes (frame f: bytes f*12+1 ..).
    def frameBytes(f: Int): Array[Byte] =
      "P6\n2 2\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(12)(i => (f * 12 + i + 1).toByte)
    val clip = frameBytes(0) ++ frameBytes(1) ++ frameBytes(2)
    assert(Multimodal.splitPpmFrames(clip, 100).map(_.length).contains(3))
    assert(Multimodal.splitPpmFrames("garbage".getBytes, 100).isEmpty)
    // Truncated LAST frame: the complete prefix frames still split out.
    assert(Multimodal.splitPpmFrames(clip.dropRight(3), 100).map(_.length).contains(2))

    val df = spark.createDataFrame(Seq((1L, clip), (2L, "junk".getBytes)))
      .toDF("media_id", "payload")
    val out = Multimodal.sampleFramesDecoded(df, "media_id", "payload", n = 2)
    // Payload 1: picks = {0·3/2, 1·3/2} = {0, 1}; payload 2: one reject row.
    val ok = out.filter(col("decode_ok")).orderBy("frame_no")
      .select("media_id", "frame_no", "width", "height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(ok == Seq((1L, 0, 2, 2), (1L, 1, 2, 2)))
    val rejects = out.filter(!col("decode_ok")).select("media_id").collect()
      .map(_.getLong(0)).toSeq
    assert(rejects == Seq(2L))
    // Frame 1's stats come from ITS bytes (13..24), not frame 0's.
    val emb = out.filter(col("decode_ok") && col("frame_no") === 1)
      .select("embedding").head().getSeq[Float](0)
    assert(emb(3) == 13f && emb(4) == 24f && emb(6) == 13f && emb(7) == 24f, emb.toString)

    // n above the frame count samples every frame exactly once.
    assert(Multimodal.sampleFramesDecoded(df.filter(col("media_id") === 1L),
      "media_id", "payload", n = 10).filter(col("decode_ok")).count() == 3)
  }

  test("quarantine: rejects come back as decode_ok=false rows, never dropped") {
    val df = spark.createDataFrame(Seq(
      (1L, ppm), (2L, "garbage".getBytes), (3L, bmp), (4L, Array[Byte]())))
      .toDF("media_id", "payload")
    val out = Multimodal.extractImageFeaturesWithRejects(df, "media_id", "payload",
      embeddingDim = 8)
    assert(out.count() == 4) // every input row accounted for
    val rejects = out.filter(!col("decode_ok"))
      .select("media_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rejects == Seq(2L, 4L))
    assert(out.filter(!col("decode_ok")).filter(col("embedding").isNotNull).count() == 0)
  }

  /** Spark jobs submitted from this thread while `body` runs (job-group
    * tagging; the status store is listener-fed, so give it a beat).
    */
  private def jobsDuring(tag: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
    try body finally spark.sparkContext.clearJobGroup()
    Thread.sleep(500)
    spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
  }

  test("extractor construction runs ZERO sizing jobs (plan stats / hint)") {
    val df = spark.createDataFrame(Seq((1L, ppm), (2L, bmp)))
      .toDF("media_id", "payload")
    // The old shape ran one agg(sum(octet_length)) job per extractor CALL,
    // before any action — partition count is a heuristic and now comes from
    // plan statistics (or the caller's hint) instead of a dedicated scan.
    val n = jobsDuring("media-sizing") {
      Multimodal.extractImageFeaturesWithRejects(df, "media_id", "payload", embeddingDim = 8)
      Multimodal.extractAudioFeatures(df, "media_id", "payload")
      Multimodal.sampleFramesDecoded(df, "media_id", "payload", n = 2)
      Multimodal.resizeImages(df, "media_id", "payload", outW = 2, outH = 2)
      Multimodal.extractImageFeaturesWithRejects(df, "media_id", "payload",
        embeddingDim = 8, totalBytesHint = Some(1L << 20))
      ()
    }
    assert(n == 0, s"extractor construction ran $n sizing jobs; expected 0")
    // and the hint produces the same rows as the stats path
    val a = Multimodal.extractImageFeatures(df, "media_id", "payload", embeddingDim = 8)
      .collect().map(_.toSeq).toSet
    val b = Multimodal.extractImageFeaturesWithRejects(df, "media_id", "payload",
        embeddingDim = 8, totalBytesHint = Some(1L))
      .filter(col("decode_ok"))
      .select(col("media_id"), col("width"), col("height"), col("embedding"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("empty media frame returns an empty result, not a crash") {
    val df = spark.createDataFrame(Seq((1L, ppm)))
      .toDF("media_id", "payload").filter(col("media_id") === 99L)
    assert(Multimodal.extractImageFeaturesWithRejects(df, "media_id", "payload").count() == 0)
    assert(Multimodal.extractAudioFeatures(df, "media_id", "payload").count() == 0)
    assert(Multimodal.sampleFramesDecoded(df, "media_id", "payload", n = 2).count() == 0)
    assert(Multimodal.resizeImages(df, "media_id", "payload", 2, 2).count() == 0)
  }
}
