package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch shape, determinism (decode kernels
  * are stubs — see Multimodal scaladoc). */
class MultimodalSpec extends SparkSuite {

  test("feature extraction: schema, determinism, null payload safety") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val feats = Multimodal.extractFeatures(media, dim = 16)
    assert(feats.schema.fieldNames.toSeq === Seq("media_id", "kind", "features"))
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length === 50)
    assert(rows.forall(_.getSeq[Double](2).length == 16))
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Double](2)).toSeq === again.map(_.getSeq[Double](2)).toSeq)

    import spark.implicits._
    val withNull = Seq((99L, "image", null: Array[Byte])).toDF("media_id", "kind", "payload")
    val f = Multimodal.extractFeatures(withNull).head()
    assert(f.getSeq[Double](2).forall(_ == 0.0))
  }

  test("dHash: encoding-invariant, gradient-stable, discriminative") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def img(seed: Long, shift: Int = 0): BufferedImage = {
      import graft.functions.HashKernels.mix64
      val im = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (by <- 0 until 8; bx <- 0 until 8) {
        val v = math.min(math.floorMod(mix64(seed * 8191L + by * 8 + bx), 256L).toInt + shift, 255)
        val rgb = (v << 16) | (v << 8) | v
        for (y <- 0 until 4; x <- 0 until 4) im.setRGB(bx * 4 + x, by * 4 + y, rgb)
      }
      im
    }
    def enc(im: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos)); bos.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h1 = Multimodal.dHash(img(1L))
    // lossless re-encode (PNG vs BMP) decodes to identical pixels -> same hash
    val media = Seq((1L, "image", enc(img(1L), "png")), (2L, "image", enc(img(1L), "bmp")),
      (3L, "image", enc(img(2L), "bmp"))).toDF("media_id", "kind", "payload")
    val hashes = Multimodal.imageHashes(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) === h1 && hashes(2L) === h1)
    // global brightness shift barely moves the hash (gradient bits flip
    // only where the +10 clips at 255); different content is far away
    assert(ham(h1, Multimodal.dHash(img(1L, shift = 10))) <= 8)
    assert(ham(h1, hashes(3L)) > 12)
  }

  test("imageNearDupPairs finds exactly the planted near-copies") {
    val pairs = Multimodal.imageNearDupPairs(
      Multimodal.syntheticImages(spark, 70), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(k => (7L * k + 5, 7L * k + 6)).toSet
    assert(planted.subsetOf(pairs), s"missed planted pairs: ${planted -- pairs}")
    assert(pairs.size <= planted.size + 2, s"spurious pairs: ${pairs -- planted}")
  }

  test("resizeImages: exact box means, re-encoded payload decodes, dHash stable") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // 8x8 left-black/right-white golden -> 4x4 resize keeps the split
    val img8 = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img8.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img8, "png", bos))
    val media = Seq((1L, "image", bos.toByteArray),
      (2L, "image", Array[Byte](9, 9, 9))).toDF("media_id", "kind", "payload")
    val out = Multimodal.resizeImages(media, 4, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).getAs[Array[Byte]](1)))
    assert(resized.getWidth === 4 && resized.getHeight === 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((resized.getRGB(x, y) & 0xffffff) === (if (x < 2) 0x000000 else 0xffffff))
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2)) // undecodable -> nulls
    // perceptual stability: a 2x downsample moves the dHash far less than
    // unrelated content does (grid cells re-align at the new size, so a
    // few bits flip on hard-edged blocky content — but nowhere near the
    // ~32 bits of an unrelated image)
    import graft.functions.HashKernels.mix64
    def blocky(seed: Long): BufferedImage = {
      val im = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (by <- 0 until 8; bx <- 0 until 8) {
        val v = math.floorMod(mix64(seed * 8191L + by * 8 + bx), 256L).toInt
        for (y <- 0 until 4; x <- 0 until 4)
          im.setRGB(bx * 4 + x, by * 4 + y, (v << 16) | (v << 8) | v)
      }
      im
    }
    val img32 = blocky(5L)
    val dSelf = java.lang.Long.bitCount(
      Multimodal.dHash(img32) ^ Multimodal.dHash(Multimodal.boxResample(img32, 16, 16)))
    val dOther = java.lang.Long.bitCount(
      Multimodal.dHash(img32) ^ Multimodal.dHash(blocky(6L)))
    assert(dSelf <= 14 && dSelf < dOther - 8, s"self $dSelf vs other $dOther")
  }

  test("resampleAudio: half-rate halves frames, envelope shape survives, nulls pass through") {
    import spark.implicits._
    // one synthetic WAV (64 amplitude blocks @ 8 kHz) downsampled to 4 kHz:
    // frames halve, the audioHash (envelope gradients) is unchanged —
    // linear interpolation preserves the block-level RMS ordering
    val media = Multimodal.syntheticAudio(spark, 1)
      .unionByName(Seq((99L, "audio", Array[Byte](1, 2, 3)))
        .toDF("media_id", "kind", "payload")
        .withColumn("meta", lit(null).cast(Multimodal.mediaSchema("meta").dataType)))
    val out = Multimodal.resampleAudio(media, 4000f)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Double]("sample_rate") === 4000.0)
    assert(out(0L).getAs[Long]("frames") === 1024L)
    assert(out(99L).isNullAt(1) && out(99L).isNullAt(2))
    val origHash = Multimodal.audioHashes(media.filter($"media_id" === 0L))
      .head().getLong(1)
    val resampledMedia = Seq((0L, "audio", out(0L).getAs[Array[Byte]](1)))
      .toDF("media_id", "kind", "payload")
    val newHash = Multimodal.audioHashes(resampledMedia).head().getLong(1)
    assert(java.lang.Long.bitCount(origHash ^ newHash) <= 4,
      s"resample moved the fingerprint: ${java.lang.Long.bitCount(origHash ^ newHash)}")
  }

  test("audioHash: gain-invariant, container-invariant; planted pairs found") {
    // gain invariance is exact: the envelope scales uniformly, gradient
    // comparisons are unchanged
    val samples = Array.tabulate(2048)(i =>
      math.sin(i * 0.01) * (1.0 + (i / 128 % 5) * 0.2))
    val scaled = samples.map(_ * 0.5)
    assert(Multimodal.audioHash(samples) === Multimodal.audioHash(scaled))
    // distinct envelopes are far apart
    val other = Array.tabulate(2048)(i => math.cos(i * 0.037) * (1.0 + (i / 64 % 7) * 0.3))
    assert(java.lang.Long.bitCount(
      Multimodal.audioHash(samples) ^ Multimodal.audioHash(other)) > 12)
    val pairs = Multimodal.audioNearDupPairs(
      Multimodal.syntheticAudio(spark, 70), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(k => (7L * k + 5, 7L * k + 6)).toSet
    assert(planted.subsetOf(pairs), s"missed planted pairs: ${planted -- pairs}")
    assert(pairs.size <= planted.size + 2, s"spurious pairs: ${pairs -- planted}")
  }

  test("real image decode: PNG/BMP round-trip to exact luminance histogram") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // 8x8 image, left half black / right half white -> dim-4 luma histogram
    // must be exactly [0.5, 0, 0, 0.5]; encoded through the JDK's own
    // PNG and BMP writers so the payload is a genuine compressed file
    def encoded(fmt: String): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", encoded("png")),
      (2L, "image", encoded("bmp")),
      (3L, "image", Array[Byte](1, 2, 3)), // undecodable -> stub fallback
      (4L, "audio", encoded("png"))        // non-image kind -> stub even if decodable
    ).toDF("media_id", "kind", "payload")

    val feats = Multimodal.extractFeatures(media, dim = 4, decodeImages = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(feats(1L) === Seq(0.5, 0.0, 0.0, 0.5))
    assert(feats(2L) === Seq(0.5, 0.0, 0.0, 0.5))
    val stub3 = Multimodal.extractFeatures(media.filter($"media_id" === 3L), dim = 4)
      .head().getSeq[Double](2)
    assert(feats(3L) === stub3)
    val stub4 = Multimodal.extractFeatures(media.filter($"media_id" === 4L), dim = 4)
      .head().getSeq[Double](2)
    assert(feats(4L) === stub4)

    // metadata probe: real dimensions for decodable images, nulls otherwise,
    // and audio rows are excluded entirely
    val meta = Multimodal.probeImageMeta(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2)))))
      .toMap
    assert(meta === Map(1L -> Some((8, 8)), 2L -> Some((8, 8)), 3L -> None))
  }

  test("real audio decode: WAV/AIFF round-trip to exact RMS envelope") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 800 frames @ 8 kHz mono 16-bit signed PCM: first half silence,
    // second half full-scale (-32768 -> exactly -1.0) -> dim-4 RMS
    // envelope must be exactly [0, 0, 1, 1]; encoded through the JDK's
    // own WAV and AIFF writers so the payload is a genuine container
    // (WAV is little-endian, AIFF big-endian — both 16-bit paths hit)
    def encoded(t: AudioFileFormat.Type, bigEndian: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val pcm = new Array[Byte](800 * 2)
      val (lo, hi) = (0x00.toByte, 0x80.toByte) // -32768: normalizes to exactly -1.0
      for (i <- 400 until 800) {
        pcm(2 * i) = if (bigEndian) hi else lo
        pcm(2 * i + 1) = if (bigEndian) lo else hi
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 800), t, bos)
      bos.toByteArray
    }
    val wav = encoded(AudioFileFormat.Type.WAVE, bigEndian = false)
    val aiff = encoded(AudioFileFormat.Type.AIFF, bigEndian = true)
    val media = Seq(
      (1L, "audio", wav),
      (2L, "audio", aiff),
      (3L, "audio", Array[Byte](1, 2, 3)), // undecodable -> stub fallback
      (4L, "image", wav)                   // non-audio kind -> stub even if decodable
    ).toDF("media_id", "kind", "payload")

    val feats = Multimodal.extractFeatures(media, dim = 4, decodeAudioPcm = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(feats(1L) === Seq(0.0, 0.0, 1.0, 1.0))
    assert(feats(2L) === Seq(0.0, 0.0, 1.0, 1.0))
    val stub3 = Multimodal.extractFeatures(media.filter($"media_id" === 3L), dim = 4)
      .head().getSeq[Double](2)
    assert(feats(3L) === stub3)
    val stub4 = Multimodal.extractFeatures(media.filter($"media_id" === 4L), dim = 4)
      .head().getSeq[Double](2)
    assert(feats(4L) === stub4)

    // metadata probe: real stream params for decodable audio, nulls
    // otherwise, and image rows are excluded entirely
    val meta = Multimodal.probeAudioMeta(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getDouble(1), r.getInt(2), r.getLong(3), r.getLong(4)))))
      .toMap
    assert(meta === Map(
      1L -> Some((8000.0, 1, 800L, 100L)),
      2L -> Some((8000.0, 1, 800L, 100L)),
      3L -> None))
  }

  test("frame sampling explodes video payloads only") {
    val media = Multimodal.syntheticMedia(spark, 10, kind = "video")
      .union(Multimodal.syntheticMedia(spark, 5, kind = "image"))
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.select("media_id").distinct().count() === 10)
    assert(frames.groupBy("media_id").count().agg(max("count")).head().getLong(0) <= 4)
  }

  test("golden batch shape: exact features, empty partitions, frame edge cases") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // hand-built rows against the canonical schema, over-partitioned so
    // most partitions are EMPTY (the batch iterator must tolerate that);
    // a future codec swap must preserve exactly these contract shapes
    val rows = Seq(
      Row(1L, "image", Array[Byte](0, -1, Byte.MinValue), Row("image/png", 2, 2, null)),
      Row(2L, "image", null, null), // null payload AND null meta
      Row(3L, "video", Array[Byte](1, 2, 3), Row("video/mp4", null, null, 99L)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), Multimodal.mediaSchema)

    val feats = Multimodal.extractFeatures(media, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    // golden: payload [0x00, 0xff, 0x80], dim 4, n = ceil(3/4) = 1
    // -> [0/255, 255/255, 128/255, 0]
    val g = feats(1L)
    assert(g(0) === 0.0 && g(1) === 1.0 && g(3) === 0.0)
    assert(math.abs(g(2) - 128.0 / 255.0) < 1e-12)
    // null payload -> zero vector of the requested dim, not null/crash
    assert(feats(2L) === Seq(0.0, 0.0, 0.0, 0.0))

    // frame sampling with n far beyond payload length: one frame per
    // available byte, never empty frames, never an index out of range
    val frames = Multimodal.sampleFrames(media, n = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(frames.forall(_._1 == 3L)) // only the video row explodes
    assert(frames.length === 3) // min(n, payload length)
    assert(frames.map(_._2).sorted.toSeq === Seq(0, 1, 2))
    assert(frames.forall(_._3.length == 1))
    // null-payload videos produce no frames (not a crash)
    val nullVideo = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "video", null, null)), 4),
      Multimodal.mediaSchema)
    assert(Multimodal.sampleFrames(nullVideo, n = 5).count() === 0L)
  }

  test("real video decode: MJPEG-in-AVI frames round-trip through the RIFF walk") {
    import org.apache.spark.sql.Row
    import java.awt.image.BufferedImage

    // six visually distinct frames -> per-frame JPEGs
    def frameImage(i: Int): BufferedImage = {
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) {
        val v = ((x * (i + 1) * 8) + y * 3) % 256
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | (i * 40 % 256))
      }
      img
    }
    def jpeg(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val jpegs = (0 until 6).map(i => jpeg(frameImage(i)))

    // the engine's own encoder: RIFF('AVI ' LIST('hdrl') LIST('movi'))
    val avi = Multimodal.encodeAviMjpeg(jpegs)

    // the RIFF walk recovers every frame byte-for-byte
    val extracted = Multimodal.decodeAviMjpegFrames(avi).get
    assert(extracted.length === 6)
    assert(extracted.zip(jpegs).forall { case (a, b) => a.sameElements(b) })

    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "video", avi, null),
        Row(2L, "video", "not a riff container".getBytes: Array[Byte], null)), 2),
      Multimodal.mediaSchema)

    // decodeVideo = true: real frames out (each a decodable JPEG with the
    // source dimensions), evenly sampled to n
    val frames = Multimodal.sampleFrames(media, n = 3, decodeVideo = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    val real = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(real.length === 3)
    real.foreach { case (_, _, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth === 32 && img.getHeight === 24)
    }
    // even sampling over 6 frames at n = 3 -> frames 0, 2, 4
    assert(real.map(_._3).zip(Seq(0, 2, 4).map(jpegs))
      .forall { case (a, b) => a.sameElements(b) })
    // non-AVI payload falls back to the byte stub (still 3 slices)
    assert(frames.count(_._1 == 2L) === 3)

    // featurization: a real histogram differs from the byte stub and is
    // a valid distribution
    val feats = Multimodal.extractFeatures(media, dim = 8, decodeVideo = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(math.abs(feats(1L).sum - 1.0) < 1e-9) // histogram sums to 1
    assert(feats(1L) !== Multimodal.extractFeatures(media, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap.apply(1L))
  }
}
