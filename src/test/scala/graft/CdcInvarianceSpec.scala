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
      // round 16: the triple payload fetch (changesWithPositions' to_batch
      // fed to liveRowsForVersions — one semi-join, no newest-row window)
      // must return EXACTLY the rows the windowed keyed fetch returns for
      // the same upsert keys, across every interval of the random
      // lifecycle (merges, deletes, revivals included)
      val delta = coll.changesWithPositions(i, j)
        .filter(col("change_type").isin("insert", "update"))
      val snapJ = coll.snapshotAt(j)
      val viaTriples = snapJ.liveRowsForVersions(
          delta.select(col("user_id"), col("doc_id"),
            col("to_batch").as("src_batch")))
        .map(_.select("doc_id", "vector").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap)
        .getOrElse(Map.empty)
      val viaWindow = snapJ.liveRowsFor(
          Some(delta.select("user_id", "doc_id")))
        .map(_.select("doc_id", "vector").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap)
        .getOrElse(Map.empty)
      assert(viaTriples === viaWindow,
        s"triple fetch diverged from windowed fetch for ($i, $j)")
    }
  }

  test("one-pass diff equals the two-sided liveDocsFor composition (r17 shape)") {
    // round 17 rewrote changesWithPositions as ONE tagged pass + ONE
    // aggregate; this pins it against the exact OLD shape (per-side
    // key-restricted liveDocsFor + full_outer) on a lifecycle whose
    // tricky cases are all present: shared segments between the two
    // versions, a tail-bearing version (merge commits with un-flushed
    // batches), deletes inside and outside the interval, and a revival.
    val base = Files.createTempDirectory("graft_cdc1pass").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "onepass", numFeatures = 4, initialNumCentroids = 4))
    def toDf(ids: Seq[Long]) = ids.map(i =>
      (0L, i, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble)))
      .toDF("user_id", "doc_id", "vector")
    coll.insert(toDf(0L until 12L)); coll.flush()            // v1: seg A
    coll.insert(toDf(10L until 20L))                          // overlap 10,11
    coll.delete(toDf(Seq(3L, 15L)).select("user_id", "doc_id"))
    coll.flush()                                              // v2: seg B
    coll.insert(toDf(Seq(3L, 25L)))                           // revive 3 + new
    coll.merge()                                              // v3: tail-bearing
    coll.flush()                                              // v4
    coll.delete(toDf(Seq(25L)).select("user_id", "doc_id")); coll.flush() // v5
    val vs = coll.versions
    for (i <- vs; j <- vs if i < j) {
      val sF = coll.snapshotAt(i); val sT = coll.snapshotAt(j)
      val touched = coll.changesWithPositions(i, j).select("user_id", "doc_id")
      // the old two-sided shape, reconstructed verbatim
      val a = sF.liveDocsFor(Some(touched)).map(_.withColumnRenamed("src_batch", "from_batch"))
      val b = sT.liveDocsFor(Some(touched)).map(_.withColumnRenamed("src_batch", "to_batch"))
      val oldShape = ((a, b) match {
        case (Some(x), Some(y)) => x.join(y, Seq("user_id", "doc_id"), "full_outer")
        case (Some(x), None) => x.withColumn("to_batch", lit(null).cast("long"))
        case (None, Some(y)) => y.withColumn("from_batch", lit(null).cast("long"))
        case (None, None) => touched
          .withColumn("from_batch", lit(null).cast("long"))
          .withColumn("to_batch", lit(null).cast("long"))
      }).withColumn("change_type",
          when(col("from_batch").isNull && col("to_batch").isNull, lit(null))
            .when(col("from_batch").isNull, lit("insert"))
            .when(col("to_batch").isNull, lit("delete"))
            .when(col("from_batch") =!= col("to_batch"), lit("update")))
        .filter(col("change_type").isNotNull)
        .select("doc_id", "change_type", "to_batch").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val newShape = coll.changesWithPositions(i, j)
        .select("doc_id", "change_type", "to_batch").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(newShape === oldShape, s"one-pass diff diverged for ($i, $j)")
    }
  }

  test("WAL clock never rewinds after expiry truncates every batch dir (r14 soak bug)") {
    // ScaleFollow round-5 divergence: expireVersions legally deletes ALL
    // fully-flushed ops batch dirs; the batch-id clock was derived from
    // the dirs alone, so the NEXT delete claimed a position at/below the
    // retained TOCs' watermark — its tombstone vanished from every
    // changes() interval (and leaked into pinned history), while
    // liveRows still masked the row: consumer mirrors silently diverged.
    // The clock (and every TOC commit) is now floored by the committed
    // walPosition.
    val base = Files.createTempDirectory("graft_cdcclock").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "clock", numFeatures = 4, initialNumCentroids = 4))
    def toDf(ids: Seq[Long]) = ids.map(i =>
      (0L, i, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble)))
      .toDF("user_id", "doc_id", "vector")
    coll.insert(toDf(0L until 20L)); coll.flush() // v1
    coll.insert(toDf(20L until 30L)); coll.flush() // v2
    val v2 = coll.versions.last
    // fully-flushed history: truncation deletes every ops batch dir
    coll.expireVersions(keep = 1)
    assert(coll.versions === Seq(v2))
    val v2Live = coll.snapshot().liveDocs.get.count()
    // post-expiry delete + insert must claim positions ABOVE v2's
    coll.delete(Seq((0L, 5L), (0L, 6L)).toDF("user_id", "doc_id"))
    coll.insert(toDf(Seq(40L)))
    coll.flush() // v3
    val v3 = coll.versions.last
    val delta = coll.changes(v2, v3).select("doc_id", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(delta === Set(5L -> "delete", 6L -> "delete", 40L -> "insert"),
      s"post-expiry ops missing from the delta: $delta")
    // pinned history stays clean: v2 (committed BEFORE the delete) must
    // still see docs 5 and 6 — a rewound tombstone position would mask
    // them retroactively
    assert(coll.snapshotAt(v2).liveDocs.get.count() === v2Live)
    assert(coll.snapshot().liveDocs.get.count() === v2Live - 2 + 1)
    // and a post-expiry maintenance commit must not rewind maxOpsBatch:
    // merge, then diff across it — still exactly the same delta story
    coll.insert(toDf(Seq(41L))); coll.flush() // v4
    coll.expireVersions(keep = 2)
    coll.merge() // v5 (logically silent)
    val v5 = coll.versions.last
    coll.delete(Seq((0L, 7L)).toDF("user_id", "doc_id")); coll.flush() // v6
    val d2 = coll.changes(v5, coll.versions.last)
      .select("doc_id", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(d2 === Set(7L -> "delete"),
      s"delete after expiry+merge missing from the delta: $d2")
  }
}
