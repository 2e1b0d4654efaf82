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

  test("frame sampling explodes video payloads only") {
    val media = Multimodal.syntheticMedia(spark, 10, kind = "video")
      .union(Multimodal.syntheticMedia(spark, 5, kind = "image"))
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.select("media_id").distinct().count() === 10)
    assert(frames.groupBy("media_id").count().agg(max("count")).head().getLong(0) <= 4)
  }
}
