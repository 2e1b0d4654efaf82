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
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are STUBS: deterministic fakes computed from the raw
  * bytes (clearly marked below). The Spark-side contract — schema,
  * partitioning, batch iteration shape, and null handling — is real and
  * tested; swapping in a real codec only replaces the marked function
  * bodies. */
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
  // STUB decode kernels — deterministic fakes over raw bytes. A real
  // pipeline replaces these bodies with an image/audio codec; signatures
  // and batch shape stay identical.
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
    * `[media_id, kind, features: array<double>]`. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        Row(r.getLong(0), r.getString(1), stubImageFeatures(payload, dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video rows: explodes each payload into `n`
    * stand-in frames `[media_id, frame_idx, frame: binary]`. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("kind") === "video").select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        stubFrameSample(payload, n).zipWithIndex.map { case (f, i) =>
          Row(r.getLong(0), i, f)
        }
      }
    }(enc)
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
