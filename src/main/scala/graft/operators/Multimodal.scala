package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payload + typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages as
  * `mapPartitions` batch transforms (the Scala analogue of
  * `mapInPandas` batch UDFs).
  *
  * Image decode is REAL (JDK ImageIO: PNG/BMP/GIF/JPEG), audio decode is
  * REAL (JDK javax.sound: WAV/AIFF/AU PCM), and video decode is REAL for
  * MJPEG-in-AVI (a pure-JVM RIFF container walk + per-frame ImageIO JPEG
  * decode — the one mainstream video container needing no external
  * codec). Other video codecs are NOT available in this environment, so
  * undecodable video payloads fall back to deterministic byte STUBS
  * (clearly marked below) under the same output contract. The Spark-side
  * contract — schema, partitioning, batch iteration shape, and null
  * handling — is real and tested; swapping in a broader codec only
  * replaces the marked function bodies. */
object Multimodal {

  /** Canonical media-table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true), // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  // ---------------------------------------------------------------------
  // REAL image decode — javax.imageio is JDK-built-in (PNG/BMP/GIF/JPEG
  // readers ship with the JDK, no external codec needed). Audio decodes
  // for real too (javax.sound.sampled parses WAV/AIFF/AU PCM, also
  // JDK-built-in). Video decode stays stubbed below (no codec libs in
  // this environment).
  // ---------------------------------------------------------------------

  /** Decode an encoded image payload with the JDK's ImageIO. Returns None
    * for null/empty/undecodable payloads — callers fall back to the
    * deterministic stub so opaque payloads keep the same contract. */
  private[operators] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Real image features: `dim`-bucket luminance histogram over decoded
    * pixels (Rec.601 luma), normalized to sum 1. One linear pixel pass. */
  private[operators] def imageHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return out
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        out(math.min(dim - 1, (luma * dim).toInt)) += 1.0
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** Probe real image dimensions for `kind = image` rows: emits
    * `[media_id, width, height]` with nulls for undecodable payloads.
    * Batch `mapPartitions`, same contract shape as the feature stage. */
  def probeImageMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "image").select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in tasks
      rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeImage(payload) match {
          case Some(img) => Row(r.getLong(0), img.getWidth, img.getHeight)
          case None      => Row(r.getLong(0), null, null)
        }
      }
    }(enc)
  }

  /** Deterministic box-filter resample: each target pixel is the
    * channel-wise mean of its source block. No Graphics2D interpolation
    * (whose output varies by rendering hints/platform) — resized bytes
    * are bit-stable across runs and hosts. */
  private[graft] def boxResample(
      img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth; val sh = img.getHeight
    var ty = 0
    while (ty < h) {
      val y0 = ty * sh / h; val y1 = math.max((ty + 1) * sh / h, y0 + 1)
      var tx = 0
      while (tx < w) {
        val x0 = tx * sw / w; val x1 = math.max((tx + 1) * sw / w, x0 + 1)
        var r = 0L; var g = 0L; var b = 0L; var n = 0
        var y = y0
        while (y < y1 && y < sh) {
          var x = x0
          while (x < x1 && x < sw) {
            val rgb = img.getRGB(x, y)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
            n += 1; x += 1
          }
          y += 1
        }
        out.setRGB(tx, ty, (((r / n).toInt) << 16) | (((g / n).toInt) << 8) | (b / n).toInt)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Resize stage for `kind = image` rows: decode, deterministic
    * box-filter resample to `width` x `height`, re-encode via the JDK
    * writer (`format`: png/bmp/...). Returns `[media_id, payload, width,
    * height]` with nulls for undecodable payloads — the pre-processing
    * step a multimodal training pipeline runs before feature extraction
    * or storage tiering. Batch `mapPartitions`, one decode per asset. */
  def resizeImages(
      media: DataFrame,
      width: Int,
      height: Int,
      format: String = "png"): DataFrame = {
    require(width > 0 && height > 0, s"bad target size ${width}x$height")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "image").select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeImage(payload) match {
          case Some(img) =>
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(boxResample(img, width, height), format, bos)
            Row(r.getLong(0), bos.toByteArray, width, height)
          case None => Row(r.getLong(0), null, null, null)
        }
      }
    }(enc)
  }

  /** Decode an encoded audio payload (WAV/AIFF/AU — the JDK's built-in
    * containers) to normalized mono samples in [-1, 1]. Channels are
    * averaged; 8- and 16-bit PCM (signed/unsigned, either endianness) are
    * handled — everything the JDK's own writers emit. Returns the format,
    * frame count, and samples; None for null/undecodable payloads so
    * callers fall back to the deterministic stub. */
  private[operators] def decodeAudio(
      payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Long, Array[Double])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
    if (payload == null || payload.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if (!(signed || unsigned) || (bits != 8 && bits != 16)) return None
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val bps = bits / 8
        val frameSize = fmt.getFrameSize
        if (frameSize <= 0 || ch <= 0) return None
        val n = bytes.length / frameSize
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val off = i * frameSize + c * bps
            acc += (if (bits == 8) {
              if (unsigned) ((bytes(off) & 0xff) - 128) / 128.0 else bytes(off) / 128.0
            } else {
              val b0 = bytes(off) & 0xff
              val b1 = bytes(off + 1) & 0xff
              val raw = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
              if (unsigned) (raw - 32768) / 32768.0 else raw.toShort / 32768.0
            })
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        Some((fmt, n.toLong, out))
      } finally in.close()
    } catch {
      case _: UnsupportedAudioFileException | _: java.io.IOException | _: RuntimeException =>
        None
    }
  }

  /** Real audio features: `dim`-window RMS energy envelope over the
    * decoded mono samples — the standard cheap loudness contour (silence
    * detection, clipping checks, segment boundaries). One linear pass. */
  private[operators] def audioEnvelope(samples: Array[Double], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (samples.isEmpty) return out
    var w = 0
    while (w < dim) {
      val from = (w.toLong * samples.length / dim).toInt
      val to = ((w + 1).toLong * samples.length / dim).toInt
      if (to > from) {
        var acc = 0.0
        var i = from
        while (i < to) { acc += samples(i) * samples(i); i += 1 }
        out(w) = math.sqrt(acc / (to - from))
      }
      w += 1
    }
    out
  }

  /** Resample stage for `kind = audio` rows: decode, linear-interpolate
    * the mono samples to `targetRate`, re-encode as 16-bit PCM WAV — the
    * audio analogue of [[resizeImages]] (rate normalization before
    * feature extraction or storage). Deterministic (pure arithmetic, no
    * codec-dependent filtering). Returns `[media_id, payload,
    * sample_rate, frames]` with nulls for undecodable payloads. */
  def resampleAudio(media: DataFrame, targetRate: Float): DataFrame = {
    require(targetRate > 0, s"bad target rate $targetRate")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("sample_rate", DoubleType, nullable = true),
      StructField("frames", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "audio").select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeAudio(payload) match {
          case Some((fmt, _, samples)) if samples.nonEmpty =>
            val ratio = fmt.getSampleRate / targetRate
            val n = math.max(1, math.round(samples.length / ratio).toInt)
            val out = new Array[Double](n)
            var i = 0
            while (i < n) {
              val pos = i * ratio
              val lo = math.min(pos.toInt, samples.length - 1)
              val hi = math.min(lo + 1, samples.length - 1)
              val frac = pos - lo
              out(i) = samples(lo) * (1 - frac) + samples(hi) * frac
              i += 1
            }
            val pcm = new Array[Byte](n * 2)
            i = 0
            while (i < n) {
              val s = math.max(-32768, math.min(32767, math.round(out(i) * 32767.0).toInt))
              pcm(2 * i) = (s & 0xff).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
            val outFmt = new AudioFormat(targetRate, 16, 1, true, false)
            val bos = new java.io.ByteArrayOutputStream()
            AudioSystem.write(
              new AudioInputStream(new java.io.ByteArrayInputStream(pcm), outFmt, n.toLong),
              AudioFileFormat.Type.WAVE, bos)
            Row(r.getLong(0), bos.toByteArray, targetRate.toDouble, n.toLong)
          case _ => Row(r.getLong(0), null, null, null)
        }
      }
    }(enc)
  }

  /** Probe real audio stream parameters for `kind = audio` rows: emits
    * `[media_id, sample_rate, channels, frames, duration_ms]` with nulls
    * for undecodable payloads. Header-only parse (no sample read). */
  def probeAudioMeta(media: DataFrame): DataFrame = {
    import javax.sound.sampled.{AudioSystem, UnsupportedAudioFileException}
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", DoubleType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("frames", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "audio").select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val parsed =
          if (payload == null || payload.isEmpty) None
          else
            try {
              val ff = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
              Some((ff.getFormat, ff.getFrameLength.toLong))
            } catch {
              case _: UnsupportedAudioFileException | _: java.io.IOException |
                  _: RuntimeException =>
                None
            }
        parsed match {
          case Some((fmt, frames)) =>
            // containers may report AudioSystem.NOT_SPECIFIED (-1) for any
            // of these — map non-positive/unknown to null per the
            // "nulls for undecodable/unknown" contract, never a sentinel
            val durMs =
              if (fmt.getFrameRate > 0 && frames >= 0)
                math.round(frames * 1000.0 / fmt.getFrameRate)
              else null
            Row(r.getLong(0),
              if (fmt.getFrameRate > 0) fmt.getFrameRate.toDouble else null,
              if (fmt.getChannels > 0) fmt.getChannels else null,
              if (frames >= 0) frames else null, durMs)
          case None => Row(r.getLong(0), null, null, null, null)
        }
      }
    }(enc)
  }

  // ---------------------------------------------------------------------
  // STUB decode kernels — deterministic fakes over raw bytes. A real
  // pipeline replaces these bodies with a video codec; signatures and
  // batch shape stay identical. (Images and audio decode for real above.)
  // ---------------------------------------------------------------------

  /** STUB: "decode" an image to a fixed-size feature vector: 16 doubles,
    * byte-histogram moments over the payload. Deterministic. */
  private[operators] def stubImageFeatures(payload: Array[Byte], dim: Int = 16): Array[Double] = {
    val out = new Array[Double](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    val n = math.max(1.0, math.ceil(payload.length.toDouble / dim))
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  // ---------------------------------------------------------------------
  // REAL video decode — MJPEG-in-AVI. An AVI file is a RIFF container;
  // with the MJPEG codec every '##dc'/'##db' chunk inside the 'movi'
  // LIST is a standalone JPEG, which the JDK's ImageIO decodes. A
  // ~40-line chunk walk is therefore a real video decoder for the one
  // mainstream container that needs no external codec library.
  // ---------------------------------------------------------------------

  /** Per-frame JPEG byte RANGES (offset, end) in an MJPEG AVI payload —
    * ranges, not copies, so a caller sampling n of thousands of frames
    * only materializes the n it keeps. Returns None when the payload is
    * not a RIFF/AVI or holds no JPEG frame chunks — callers fall back to
    * the byte stub. */
  private[graft] def aviMjpegFrameRanges(payload: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (payload == null || payload.length < 12) return None
    def fourcc(off: Int): String =
      if (off + 4 <= payload.length) new String(payload, off, 4, "US-ASCII") else ""
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off)
        val sz = u32(off + 4)
        val body = off + 8
        if (sz < 0 || body + sz > payload.length) return // truncated/garbage
        val bodyEnd = (body + sz).toInt
        if (id == "LIST" && sz >= 4) walk(body + 4, bodyEnd)
        else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) && sz >= 2 &&
          (payload(body) & 0xff) == 0xff && (payload(body + 1) & 0xff) == 0xd8)
          frames += ((body, bodyEnd))
        off = bodyEnd + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, payload.length)
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  /** All frames as byte arrays (test/one-shot convenience; the batch
    * operators sample RANGES first and copy only what they keep). */
  private[graft] def decodeAviMjpegFrames(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    aviMjpegFrameRanges(payload).map(_.map { case (a, b) =>
      java.util.Arrays.copyOfRange(payload, a, b)
    })

  /** Evenly sample `n` of the `frames` (all of them when n >= count). */
  private def evenSample[A](frames: Seq[A], n: Int): Seq[A] =
    if (frames.length <= n) frames
    else (0 until n).map(i => frames((i.toLong * frames.length / n).toInt))

  /** The matching ENCODER: wrap JPEG frame payloads into a minimal valid
    * MJPEG AVI (RIFF('AVI ' LIST('hdrl' avih) LIST('movi' '00dc'*))) —
    * the write path for video assets that [[decodeAviMjpegFrames]] reads
    * back byte-for-byte. Pure JVM, no codec library. */
  private[graft] def encodeAviMjpeg(jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array() // the odd-length pad byte (if any) stays zero
    }
    def list(subtype: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ children)
    val avih = chunk("avih", new Array[Byte](56))
    val movi = list("movi", jpegFrames.flatMap(j => chunk("00dc", j)).toArray)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ list("hdrl", avih) ++ movi
    java.nio.ByteBuffer.allocate(8 + riffBody.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(riffBody.length).put(riffBody)
      .array()
  }

  /** STUB: "frame-sample" a video payload: slice `n` evenly spaced windows
    * of the byte stream as stand-in frames. Deterministic. */
  private[operators] def stubFrameSample(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty || n <= 0) return Seq.empty
    val stride = math.max(1, payload.length / n)
    (0 until math.min(n, payload.length)).map { i =>
      val from = i * stride
      payload.slice(from, math.min(from + stride, payload.length))
    }
  }

  /** Feature extraction over a media table: batch `mapPartitions` (one JVM
    * pass per partition, no per-row UDF dispatch), emitting
    * `[media_id, kind, features: array<double>]`.
    *
    * With `decodeImages = true`, `kind = image` payloads are decoded for
    * real via ImageIO and featurized as a luminance histogram; with
    * `decodeAudioPcm = true`, `kind = audio` payloads are decoded via
    * javax.sound (WAV/AIFF/AU) and featurized as an RMS energy envelope.
    * Anything undecodable (and all other kinds) falls back to the
    * deterministic byte-stub so the output contract never changes shape.
    * The q34 oracle keeps the default (stub-only) path, which DuckDB can
    * replay. */
  def extractFeatures(
      media: DataFrame,
      dim: Int = 16,
      decodeImages: Boolean = false,
      decodeAudioPcm: Boolean = false,
      decodeVideo: Boolean = false): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      if (decodeImages) javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val kind = r.getString(1)
        val feats =
          if (decodeImages && kind == "image")
            decodeImage(payload).map(imageHistogram(_, dim))
              .getOrElse(stubImageFeatures(payload, dim))
          else if (decodeAudioPcm && kind == "audio")
            decodeAudio(payload).map { case (_, _, samples) => audioEnvelope(samples, dim) }
              .getOrElse(stubImageFeatures(payload, dim))
          else if (decodeVideo && kind == "video")
            // mean per-frame luminance histogram over up to 8 evenly
            // sampled decoded frames (MJPEG-AVI); only sampled ranges copy
            aviMjpegFrameRanges(payload).flatMap { fr =>
              val hists = evenSample(fr, 8).flatMap { case (a, b) =>
                decodeImage(java.util.Arrays.copyOfRange(payload, a, b))
                  .map(imageHistogram(_, dim))
              }
              if (hists.isEmpty) None
              else Some(hists.transpose.map(_.sum / hists.length).toArray)
            }.getOrElse(stubImageFeatures(payload, dim))
          else stubImageFeatures(payload, dim)
        Row(r.getLong(0), kind, feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video rows: explodes each payload into `n`
    * frames `[media_id, frame_idx, frame: binary]`.
    *
    * With `decodeVideo = true`, MJPEG-AVI payloads decode for REAL: the
    * RIFF walk yields every JPEG frame, `n` are sampled evenly spaced,
    * and each output `frame` is a standalone JPEG (ImageIO-decodable
    * downstream — resize/dHash/near-dup compose directly). Payloads in
    * any other container fall back to the deterministic byte stub, so
    * the contract never changes shape. */
  def sampleFrames(media: DataFrame, n: Int, decodeVideo: Boolean = false): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "video").select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val frames =
          if (decodeVideo)
            aviMjpegFrameRanges(payload).map(rs => evenSample(rs, n).map {
              case (a, b) => java.util.Arrays.copyOfRange(payload, a, b)
            }).getOrElse(stubFrameSample(payload, n))
          else stubFrameSample(payload, n)
        frames.zipWithIndex.map { case (f, i) => Row(r.getLong(0), i, f) }
      }
    }(enc)
  }

  // ---------------------------------------------------------------------
  // Perceptual image hashing + near-dup — image dedup is the multimodal
  // face of the text near-dup family: a 64-bit dHash per image, then the
  // SAME blocked-LSH machinery as text simhash (recall 1.0 at the radius
  // by construction, exact Hamming verify).
  // ---------------------------------------------------------------------

  /** 64-bit difference hash (dHash): box-filter the decoded image to a
    * 9x8 grayscale grid, emit one bit per horizontal neighbor comparison.
    * Survives re-encoding, resizing, and mild global brightness shifts
    * (gradients, not absolute levels); Hamming distance approximates
    * visual difference. One linear pixel pass. */
  private[graft] def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return 0L
    val g = Array.ofDim[Double](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var sum = 0.0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        g(gy)(gx) = sum / ((math.min(y1, h) - y0).toDouble * (math.min(x1, w) - x0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    var yy = 0
    while (yy < gh) {
      var xx = 0
      while (xx < 8) {
        if (g(yy)(xx) < g(yy)(xx + 1)) bits |= (1L << i)
        i += 1; xx += 1
      }
      yy += 1
    }
    bits
  }

  /** Per-image dHash sketches for `kind = image` rows: `[id, sk]` — the
    * image-side analogue of the text `simhash` column. Undecodable
    * payloads are dropped (no visual content to dedup). Batch
    * `mapPartitions` decode, same contract shape as [[probeImageMeta]];
    * persist the output as the corpus's standing image-hash artifact. */
  def imageHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sk", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "image").select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeImage(payload).map(img => Row(r.getLong(0), dHash(img)))
      }
    }(enc)
  }

  /** Image near-duplicate pairs `[a, b, hamming]`: dHash sketches through
    * [[Dedup.simhashPairsFromSketches]] — the identical blocked-LSH
    * bucket join and in-state Hamming verify the text path uses, so the
    * 100 TB posture (band shuffle of (id, long) rows only, hot-bucket
    * guard) carries over unchanged. */
  def imageNearDupPairs(
      media: DataFrame,
      maxHamming: Int = 6,
      maxBucket: Int = 8192): DataFrame =
    Dedup.simhashPairsFromSketches(imageHashes(media), maxHamming, maxBucket = maxBucket)

  /** Deterministic REAL-encoded synthetic images (BMP via the JDK
    * writer): seeded 32x32 blocky grayscale content; every 7th image is a
    * near-copy of its predecessor with one block brightened — planted
    * positives for [[imageNearDupPairs]]. */
  def syntheticImages(spark: SparkSession, n: Int): DataFrame = {
    val gen = udf { (id: Long) =>
      import graft.functions.HashKernels.mix64
      val dup = id % 7 == 6
      val seed = if (dup) id - 1 else id
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (by <- 0 until 8; bx <- 0 until 8) {
        val v0 = (math.floorMod(mix64(seed * 8191L + by * 8 + bx), 256L)).toInt
        val v = if (dup && by == 0 && bx == 0) math.min(v0 + 48, 255) else v0
        val rgb = (v << 16) | (v << 8) | v
        for (y <- 0 until 4; x <- 0 until 4) img.setRGB(bx * 4 + x, by * 4 + y, rgb)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      lit("image").as("kind"),
      gen(col("id")).as("payload"),
      struct(
        lit("image/bmp").as("mime"),
        lit(32).cast(IntegerType).as("width"),
        lit(32).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
  }

  /** 64-bit audio fingerprint: gradient bits over a 65-bucket RMS
    * envelope of the decoded samples ([[audioEnvelope]]) — one bit per
    * neighbor comparison, the audio analogue of [[dHash]]. Comparisons
    * are invariant under uniform gain (volume-normalized copies hash
    * identically) and stable under re-containering (WAV vs AIFF decode
    * to the same samples). */
  private[graft] def audioHash(samples: Array[Double]): Long = {
    val env = audioEnvelope(samples, 65)
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (env(i) < env(i + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Per-asset audio fingerprints for `kind = audio` rows: `[id, sk]`.
    * Undecodable payloads are dropped. Batch `mapPartitions` decode. */
  def audioHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sk", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "audio").select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeAudio(payload).map { case (_, _, samples) => Row(r.getLong(0), audioHash(samples)) }
      }
    }(enc)
  }

  /** Audio near-duplicate pairs `[a, b, hamming]` — fingerprints through
    * the same blocked-LSH machinery as text simhash and [[imageNearDupPairs]]. */
  def audioNearDupPairs(
      media: DataFrame,
      maxHamming: Int = 6,
      maxBucket: Int = 8192): DataFrame =
    Dedup.simhashPairsFromSketches(audioHashes(media), maxHamming, maxBucket = maxBucket)

  /** Deterministic REAL-encoded synthetic audio (16-bit PCM WAV via the
    * JDK writer): 64 seeded-amplitude blocks of alternating-sign samples;
    * every 7th asset is a gain-scaled (x0.8) copy of its predecessor —
    * planted positives for [[audioNearDupPairs]] (gain-invariant hash). */
  def syntheticAudio(spark: SparkSession, n: Int): DataFrame = {
    val gen = udf { (id: Long) =>
      import graft.functions.HashKernels.mix64
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val dup = id % 7 == 6
      val seed = if (dup) id - 1 else id
      val gain = if (dup) 0.8 else 1.0
      val frames = 2048
      val pcm = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val level = math.floorMod(mix64(seed * 4099L + i / 32), 30000L).toInt
        val s = (level * gain).toInt * (if (i % 2 == 0) 1 else -1)
        pcm(2 * i) = (s & 0xff).toByte          // little-endian 16-bit
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      lit("audio").as("kind"),
      gen(col("id")).as("payload"),
      struct(
        lit("audio/wav").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(256L).as("duration_ms")).as("meta"))
  }

  /** Deterministic synthetic media table for tests/demos: payload bytes
    * seeded from the id (stands in for real encoded assets). */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      lit(kind).as("kind"),
      // payload: sha2 bytes of the id, repeated — deterministic, opaque
      unbase64(base64(sha2(col("id").cast("string").cast("binary"), 256).cast("binary"))).as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
  }
}
