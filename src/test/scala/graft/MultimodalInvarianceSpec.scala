package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Partition-boundary invariance of the multimodal near-dup pair
  * derivations: the emitted pair SET (blocked-LSH bucket join +
  * in-state Hamming verify, emit-once) must equal a brute-force driver
  * scan over the same decoded sketches at EVERY shuffle-partition
  * count. Real encodings (BMP / 16-bit WAV through the JDK coders) —
  * the decode is deterministic, so the sketch table is fixed and only
  * the pair machinery varies with partitioning. */
class MultimodalInvarianceSpec extends AnyFunSuite {

  private def bruteforce(sk: Seq[(Long, Long)], maxHamming: Int): Set[(Long, Long, Long)] =
    (for {
      (a, sa) <- sk
      (b, sb) <- sk
      if a < b
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= maxHamming
    } yield (a, b, h.toLong)).toSet

  test("image and audio near-dup pairs equal brute force at 2/5/11/32 partitions") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val images = Multimodal.syntheticImages(spark, 140).persist()
      val audio = Multimodal.syntheticAudio(spark, 140).persist()
      val imgTruth = bruteforce(
        Multimodal.imageHashes(images).as[(Long, Long)].collect().toSeq, 6)
      val audTruth = bruteforce(
        Multimodal.audioHashes(audio).as[(Long, Long)].collect().toSeq, 6)
      assert(imgTruth.nonEmpty && audTruth.nonEmpty, "planted positives missing")
      for (np <- Seq(2, 5, 11, 32)) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        val gotImg = Multimodal.imageNearDupPairs(images.repartition(7), maxHamming = 6)
          .as[(Long, Long, Long)].collect().toSet
        assert(gotImg == imgTruth,
          s"np=$np image: ${gotImg.size} vs ${imgTruth.size}")
        val gotAud = Multimodal.audioNearDupPairs(audio.repartition(7), maxHamming = 6)
          .as[(Long, Long, Long)].collect().toSet
        assert(gotAud == audTruth,
          s"np=$np audio: ${gotAud.size} vs ${audTruth.size}")
      }
      images.unpersist(blocking = false)
      audio.unpersist(blocking = false)
    } finally spark.conf.set("spark.sql.shuffle.partitions", 32)
  }
}
