package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.core.{Collection, CollectionConfig, Toc}
import graft.operators.SearchParams

/** Time-travel reads over TOC history (`Collection.snapshotAt`) and
  * history GC (`expireVersions`). Logical time is the WAL position the
  * version recorded at commit (Toc.maxOpsBatch): a historical view is
  * "inserts with batch <= P, deletes with tomb_batch <= P" — nothing in
  * the write path deletes data, so every on-disk version is
  * reconstructible until expired. */
class TimeTravelSpec extends SparkSuite {
  import spark.implicits._

  private def tmpBase(): String =
    Files.createTempDirectory("graft_tt").toString

  private val config = CollectionConfig(
    name = "tt", numFeatures = 4, initialNumCentroids = 4)

  private def rows(ids: Seq[Long]) = ids.map { i =>
    (0L, i, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
  }.toDF("user_id", "doc_id", "vector")

  private val exact = SearchParams(topK = 64,
    numExploredCentroids = Some(Int.MaxValue), centroidDistanceRatio = 1e18)

  // query strictly off every point: the ratio prune is multiplicative
  // (dist <= ratio * min), so a query exactly ON a centroid would prune
  // to distance-0 lists no matter how large the ratio is
  private def docsOf(snap: graft.core.Snapshot): Seq[Long] =
    snap.search(Seq(-0.5, -0.5, -0.5, -0.5), exact, userIds = Seq(0L))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("snapshotAt replays each lifecycle version; current == last version") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    val evens = (0L until 20L).filter(_ % 2 == 0)
    val odds = (0L until 20L).filter(_ % 2 == 1)

    coll.insert(rows(evens)); coll.flush()                     // v1
    coll.insert(rows(odds))
    coll.delete(rows(Seq(0L, 10L)).select("user_id", "doc_id"))
    coll.flush()                                               // v2
    coll.merge()                                               // v3

    assert(coll.versions === Seq(0L, 1L, 2L, 3L))
    // v1: evens only, the later delete of 0/10 is NOT visible
    assert(docsOf(coll.snapshotAt(1L)) === evens)
    // v2: everything except the deleted 0 and 10
    val live = (0L until 20L).filterNot(i => i == 0L || i == 10L)
    assert(docsOf(coll.snapshotAt(2L)) === live)
    // v3 (the merge) == the live snapshot
    assert(docsOf(coll.snapshotAt(3L)) === live)
    assert(docsOf(coll.snapshot()) === live)
  }

  test("post-commit inserts and deletes stay invisible to a pinned version") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 8L)); coll.flush()               // v1
    coll.insert(rows(8L until 12L)); coll.flush()              // v2
    coll.merge()                                               // v3

    // after v3's commit: one unflushed insert + one delete
    coll.insert(rows(Seq(100L)))
    coll.delete(rows(Seq(3L)).select("user_id", "doc_id"))

    val nowDocs = docsOf(coll.snapshot())
    assert(nowDocs.contains(100L) && !nowDocs.contains(3L)) // read-your-writes
    val v3Docs = docsOf(coll.snapshotAt(3L))
    assert(!v3Docs.contains(100L), "post-commit insert leaked into history")
    assert(v3Docs.contains(3L), "post-commit delete leaked into history")
  }

  test("a version whose commit saw an unflushed tail replays that tail") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 4L)); coll.flush()               // v1
    coll.insert(rows(4L until 8L)); coll.flush()               // v2
    coll.insert(rows(Seq(50L)))   // tail at merge time
    coll.merge()                                               // v3: maxOps covers 50
    coll.flush()                                               // v4: 50 flushed

    val t3 = Toc.readVersion(coll.path, 3L).get
    assert(t3.maxOpsBatch > t3.lastFlushedBatch)
    assert(docsOf(coll.snapshotAt(3L)).contains(50L))
    assert(docsOf(coll.snapshotAt(2L)) === (0L until 8L))
    assert(docsOf(coll.snapshot()) === ((0L until 8L) :+ 50L))
  }

  private def changeMap(coll: Collection, from: Long, to: Long): Map[Long, String] =
    coll.changes(from, to).select("doc_id", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("changes: inserts, deletes, revive-as-update; merge is logically silent") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    val evens = (0L until 20L).filter(_ % 2 == 0)
    val odds = (0L until 20L).filter(_ % 2 == 1)

    coll.insert(rows(evens)); coll.flush()                     // v1
    coll.insert(rows(odds))
    coll.delete(rows(Seq(0L, 10L)).select("user_id", "doc_id"))
    coll.flush()                                               // v2
    coll.merge()                                               // v3
    coll.insert(rows(Seq(0L)))                                 // revive 0
    coll.flush()                                               // v4

    // v1 -> v2: odds inserted, 0 and 10 deleted
    val d12 = changeMap(coll, 1L, 2L)
    assert(odds.forall(d12.get(_).contains("insert")))
    assert(d12.get(0L).contains("delete") && d12.get(10L).contains("delete"))
    assert(d12.size === odds.size + 2, "untouched evens must not appear")

    // v2 -> v3 (the merge): physical rewrite, zero logical changes
    assert(changeMap(coll, 2L, 3L).isEmpty)

    // v3 -> v4: doc 0 revived — delete+re-insert across the base version
    // reads as a plain insert (not live at v3); doc 10 stays deleted
    val d34 = changeMap(coll, 3L, 4L)
    assert(d34 === Map(0L -> "insert"))

    // v1 -> v4 composed: 0 was live at v1 AND at v4 but its surviving row
    // moved WAL position (delete + revive in between) -> update
    val d14 = changeMap(coll, 1L, 4L)
    assert(d14.get(0L).contains("update"))
    assert(d14.get(10L).contains("delete"))
    assert(odds.forall(d14.get(_).contains("insert")))
    assert(d14.size === odds.size + 2)

    // identity diff is empty; inverted range rejected
    assert(changeMap(coll, 4L, 4L).isEmpty)
    intercept[IllegalArgumentException](coll.changes(4L, 1L))
  }

  test("changes sees an unflushed tail and no-op deletes stay silent") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 4L)); coll.flush()               // v1
    coll.insert(rows(4L until 6L)); coll.flush()               // v2
    coll.insert(rows(Seq(9L)))                                 // tail only
    coll.delete(rows(Seq(777L)).select("user_id", "doc_id"))   // key never lived
    coll.merge()                                               // v3 (pins tail)

    val d = changeMap(coll, 2L, 3L)
    assert(d === Map(9L -> "insert"), s"no-op delete of 777 must be silent: $d")
    // v0 (empty collection) -> v1: everything is an insert
    assert(changeMap(coll, 0L, 1L) === (0L until 4L).map(_ -> "insert").toMap)
  }

  test("a delete right after a commit has its own WAL position (no history leak)") {
    // Regression (caught by ScaleCdc): tomb_batch used to be maxBatchId(),
    // so a delete issued after v1's commit but before any new insert reused
    // v1's position — snapshotAt(1) showed the doc deleted and changes()
    // dropped the delete entirely.
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 8L)); coll.flush()               // v1
    coll.delete(rows(Seq(2L)).select("user_id", "doc_id"))     // no insert first!
    assert(docsOf(coll.snapshotAt(1L)) === (0L until 8L),
      "post-commit delete leaked into pinned history")
    assert(!docsOf(coll.snapshot()).contains(2L)) // live view sees it
    // a delete-only flush still commits the watermark as v2
    assert(coll.flush() === None)
    assert(coll.versions.max === 2L)
    assert(docsOf(coll.snapshotAt(2L)) === (0L until 8L).filterNot(_ == 2L))
    assert(changeMap(coll, 1L, 2L) === Map(2L -> "delete"))
  }

  test("legacy tombstones (no tomb_batch) stay visible in every historical view") {
    // Files predating the watermark column normalize to tomb_batch =
    // Long.MaxValue ("hide every batch, unsequenced"). They carry no WAL
    // position, so snapshotAt must apply them to EVERY version — without
    // the explicit MaxValue case snapshotAt(latest) diverged from
    // snapshot() on collections with pre-watermark tombstone files.
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 8L)); coll.flush()               // v1
    coll.insert(rows(8L until 10L)); coll.flush()              // v2
    // simulate a pre-watermark tombstone file: (user_id, doc_id) only
    rows(Seq(5L)).select("user_id", "doc_id")
      .write.mode("append").parquet(s"${coll.path}/tombstones")
    val live = (0L until 10L).filterNot(_ == 5L)
    assert(docsOf(coll.snapshot()) === live)
    assert(docsOf(coll.snapshotAt(2L)) === live,
      "legacy tombstone invisible to snapshotAt(latest)")
    assert(docsOf(coll.snapshotAt(1L)) === (0L until 8L).filterNot(_ == 5L))
  }

  test("changes() empty-interval schema matches the collection's key types (u128)") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    val bin = rows(0L until 6L).select(col("user_id"),
      graft.core.Ids.fromLong(col("doc_id")).as("doc_id"), col("vector"))
    coll.insert(bin); coll.flush()                             // v1
    val empty = coll.changes(1L, 1L)
    assert(empty.count() === 0L)
    assert(empty.schema("doc_id").dataType ===
      org.apache.spark.sql.types.BinaryType,
      "empty delta must carry the collection's actual key type")
    // and it unions cleanly with a non-empty delta of the same collection
    val full = coll.changes(0L, 1L)
    assert(full.unionByName(empty).count() === full.count())
  }

  test("backup and liveRowsFor are u128-id agnostic (binary keys end to end)") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    def bin(ids: Seq[Long]) = rows(ids).select(col("user_id"),
      graft.core.Ids.fromLong(col("doc_id")).as("doc_id"), col("vector"))
    coll.insert(bin(0L until 8L)); coll.flush()                // v1
    coll.delete(bin(Seq(3L)).select("user_id", "doc_id"))
    coll.insert(bin(8L until 10L))
    coll.flush()                                               // v2

    val restored = coll.backup(tmpBase(), 2L)
    def keySet(s: graft.core.Snapshot): Set[Seq[Byte]] =
      s.liveDocs.get.select("doc_id").collect()
        .map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(keySet(restored.snapshot()) === keySet(coll.snapshotAt(2L)))
    assert(keySet(restored.snapshot()).size === 9) // 10 minus the delete

    // restricted fetch on binary keys: ask for one live + one deleted —
    // only the live key (2) comes back; the tombstoned key (3) does not
    val want = bin(Seq(2L, 3L)).select("user_id", "doc_id")
    val got = restored.snapshot().liveRowsFor(Some(want)).get
      .select("doc_id").collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    val expect = bin(Seq(2L)).select("doc_id").collect()
      .map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(got === expect)
  }

  test("expireVersions trims TOCs, unreferenced segments and flushed WAL batches") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 6L)); coll.flush()               // v1 (seg_1)
    coll.insert(rows(6L until 12L)); coll.flush()              // v2 (seg_2)
    coll.merge()                                               // v3 (merged_3)

    val removed = coll.expireVersions(keep = 1)
    assert(removed.sorted === Seq("seg_1", "seg_2"))
    assert(coll.versions === Seq(3L))
    assert(!Files.exists(Paths.get(coll.path, "segments", "seg_1")))
    assert(Files.exists(Paths.get(coll.path, "segments", "merged_3")))
    // WAL truncated up to the kept version's lastFlushedBatch
    assert(!Files.exists(Paths.get(coll.path, "ops", "batch=0")))
    // current reads unaffected; expired history throws
    assert(docsOf(coll.snapshot()) === (0L until 12L))
    intercept[IllegalArgumentException](coll.snapshotAt(1L))
    // keeping >1 versions retains shared segments
    val removedAgain = coll.expireVersions(keep = 5)
    assert(removedAgain.isEmpty)
  }

  test("a live pinned snapshot survives expireVersions (read-during-expiry)") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 6L)); coll.flush()               // v1 (seg_1)
    coll.insert(rows(6L until 12L)); coll.flush()              // v2 (seg_2)
    coll.merge()                                               // v3 (merged_3)
    var pin: graft.core.Snapshot = coll.snapshotAt(1L)         // live pin on v1
    val removed = coll.expireVersions(keep = 1)
    // pinned v1 (and its seg_1) survive GC; unpinned v2 is trimmed
    assert(removed === Seq("seg_2"))
    assert(coll.versions === Seq(1L, 3L))
    assert(Files.exists(Paths.get(coll.path, "segments", "seg_1")))
    assert(docsOf(pin) === (0L until 6L),
      "pinned version unreadable after a concurrent expiry")
    assert(docsOf(coll.snapshot()) === (0L until 12L))
    // drop the pin: once the weak ref clears, the next expiry trims v1
    pin = null
    val deadline = System.currentTimeMillis() + 30000
    while (coll.versions.contains(1L) && System.currentTimeMillis() < deadline) {
      System.gc()
      Thread.sleep(50)
      coll.expireVersions(keep = 1)
    }
    assert(coll.versions === Seq(3L), "dropped pin must stop protecting v1")
    assert(!Files.exists(Paths.get(coll.path, "segments", "seg_1")))
  }

  test("backup clones exactly one version: segment + tail + visible tombstones") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 10L)); coll.flush()              // v1 (segment)
    coll.insert(rows(10L until 14L))                           // unflushed tail
    coll.delete(rows(Seq(2L)).select("user_id", "doc_id"))     // pre-commit tomb
    coll.flush()                                               // v2
    coll.insert(rows(14L until 16L))
    coll.delete(rows(Seq(4L)).select("user_id", "doc_id"))     // post-v2: must NOT leak
    coll.flush()                                               // v3

    val destBase = tmpBase()
    val restored = coll.backup(destBase, 2L)
    val v2Live = (0L until 14L).filterNot(_ == 2L)
    assert(docsOf(restored.snapshot()) === v2Live)
    assert(docsOf(coll.snapshotAt(2L)) === v2Live)
    // the clone holds ONLY v2 — later versions/writes do not exist there
    assert(restored.versions === Seq(2L))
    // mutating the source never touches the clone
    coll.delete(rows(Seq(6L)).select("user_id", "doc_id")); coll.flush()
    coll.merge()
    coll.expireVersions(keep = 1)
    assert(docsOf(restored.snapshot()) === v2Live)
    // the clone is a real collection: it can keep writing independently
    restored.insert(rows(Seq(90L))); restored.flush()
    assert(docsOf(restored.snapshot()) === (v2Live :+ 90L))
    assert(docsOf(coll.snapshot()) !== (v2Live :+ 90L))
    // a non-empty destination is refused
    intercept[IllegalArgumentException] { coll.backup(destBase, 3L) }
  }

  test("backup of a version whose tail holds a revive keeps the newest payload") {
    val base = tmpBase()
    val coll = Collection.create(spark, base, config)
    coll.insert(rows(0L until 6L)); coll.flush()               // v1
    coll.delete(rows(Seq(3L)).select("user_id", "doc_id"))
    coll.insert(Seq((0L, 3L, Seq(9.0, 9.0, 9.0, 9.0))).toDF("user_id", "doc_id", "vector"))
    coll.flush()                                               // v2: 3 revived
    val restored = coll.backup(tmpBase(), 2L)
    val live = restored.snapshot().liveRows.get
      .select("doc_id", "vector").as[(Long, Seq[Double])].collect().toMap
    assert(live.keySet === (0L until 6L).toSet)
    assert(live(3L) === Seq(9.0, 9.0, 9.0, 9.0))
  }
}
