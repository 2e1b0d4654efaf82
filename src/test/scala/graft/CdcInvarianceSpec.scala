package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Collection, CollectionConfig}

/** CDC algebra over a RANDOM lifecycle, checked against a driver-side
  * simulation (same pattern as the Session/PrefixScan/Asof invariance
  * suites: the engine's distributed derivation vs a trivially-correct
  * scalar replay). A seeded op stream of inserts / deletes / flushes /
  * merges runs through a real collection; the simulation tracks, per
  * committed version, the live key -> generation map (generation = op
  * index of the key's newest surviving insert). For EVERY retained
  * version pair (i < j), `Collection.changes(i, j)` must equal the
  * simulated diff: present-only-in-j = insert, present-only-in-i =
  * delete, present-in-both-with-moved-generation = update, everything
  * else silent — including all merge-only steps. */
class CdcInvarianceSpec extends SparkSuite {
  import spark.implicits._

  test("changes(i, j) equals the simulated diff for every version pair") {
    val base = Files.createTempDirectory("graft_cdcinv").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "cdcinv", numFeatures = 4, initialNumCentroids = 4))
    def toDf(ids: Seq[Long]) = ids.map(i =>
      (0L, i, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble)))
      .toDF("user_id", "doc_id", "vector")

    val rnd = new scala.util.Random(42)
    val domain = (0L until 40L).toVector
    var live = Map.empty[Long, Int] // key -> generation
    var versionState = Map.empty[Long, Map[Long, Int]]
    versionState += 0L -> live
    def record(): Unit = {
      val v = coll.toc.version
      if (!versionState.contains(v)) versionState += v -> live
    }
    var gen = 0
    val ops = 24
    (0 until ops).foreach { _ =>
      gen += 1
      rnd.nextInt(100) match {
        case r if r < 40 =>
          val ks = rnd.shuffle(domain).take(1 + rnd.nextInt(6)).toSeq.sorted
          coll.insert(toDf(ks))
          live ++= ks.map(_ -> gen)
        case r if r < 65 =>
          val ks = rnd.shuffle(domain).take(1 + rnd.nextInt(5)).toSeq.sorted
          coll.delete(toDf(ks).select("user_id", "doc_id"))
          live --= ks // no-op deletes of absent keys stay silent
        case r if r < 90 =>
          coll.flush(); record()
        case _ =>
          coll.merge(); record()
      }
    }
    coll.flush(); record()

    val versions = versionState.keys.toSeq.sorted
    assert(versions.size >= 4, s"lifecycle committed too few versions: $versions")
    for (i <- versions; j <- versions if i < j) {
      val a = versionState(i); val b = versionState(j)
      val expected =
        (b.keySet -- a.keySet).map(_ -> "insert") ++
        (a.keySet -- b.keySet).map(_ -> "delete") ++
        (a.keySet & b.keySet).collect { case k if a(k) != b(k) => k -> "update" }
      val got = coll.changes(i, j).select("doc_id", "change_type").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got === expected.toSet, s"changes($i, $j) diverged from simulation")
    }
  }
}
