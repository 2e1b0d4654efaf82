package graft.streaming

import org.apache.spark.sql.functions._

import graft.core.Collection
import graft.operators.CdcMirror

/** The end-to-end CDC consumer loop: tail a collection's committed
  * versions and keep a downstream [[graft.operators.CdcMirror]] (bucketed
  * copy-on-write parquet) converged with its live rows — the productized
  * form of the recipe q103 gates step-by-step and q110 gates through the
  * bucketed storage. Each `followOnce`:
  *
  *   1. diffs `(seenVersion, latest]` with [[Collection.changes]] —
  *      O(delta) by plan shape (WAL-touched keys only);
  *   2. fetches upsert payloads with [[graft.core.Snapshot.liveRowsFor]]
  *      (key semi-join BEFORE the newest-row window — never a corpus
  *      window);
  *   3. applies via [[CdcMirror.applyDelta]], rewriting only the buckets
  *      containing touched keys.
  *
  * So one follow costs O(|delta| + touched buckets), at any corpus and
  * any mirror size. The mirror is keyed by (user_id, doc_id) — the
  * collection's own CDC key — so tenants with overlapping doc_ids never
  * clobber each other's rows. The loop is idempotent at the version
  * level (a follow with no new version is a no-op), the APPLY is
  * idempotent at the delta level (CdcMirror drops upsert keys before
  * re-adding them, so a crash-retry between the apply and recording the
  * new seen-version converges instead of duplicating inserts), and
  * deltas compose across versions (changes() emits the NET delta, the
  * same composability q103 proves) — a follower that slept through five
  * commits catches up in one apply. Reference anchor: the consumer side
  * of WAL shipping — rs/index_server keeps replicas current the same
  * diff-fetch-apply way, segment-by-segment. */
object CdcFollower {

  private val keyCols = Seq("user_id", "doc_id")

  /** Seed the mirror from the collection's CURRENT version (pinned while
    * copying). Returns the seeded version — pass it as `seenVersion` to
    * the first `followOnce`. The collection must hold at least one row
    * (segments or unflushed tail): an empty collection has no row schema
    * to pin the mirror's metadata on, so seeding one fails with a
    * descriptive error instead of a bare NoSuchElementException — insert
    * first, or seed after the first flush. */
  def seed(coll: Collection, mirrorPath: String, numBuckets: Int,
      payloadCols: Seq[String] = Seq("user_id", "doc_id", "vector")): Long = {
    require(keyCols.forall(payloadCols.contains),
      s"the mirror is keyed by ${keyCols.mkString("+")} — payloadCols must include them")
    val snap = coll.snapshot() // atomically: resolve current version + pin
    try {
      val rows = snap.liveRows.getOrElse(throw new IllegalStateException(
        "CdcFollower.seed: the collection has no segments and no unflushed " +
          "tail — an empty collection carries no row schema to pin the " +
          "mirror on; insert (or flush) before seeding"))
      CdcMirror.seed(rows.select(payloadCols.map(col): _*),
        mirrorPath, keyCols, numBuckets)
      snap.toc.version
    } finally java.lang.ref.Reference.reachabilityFence(snap)
  }

  /** Apply everything committed since `seenVersion`. Returns the version
    * the mirror now reflects (== `seenVersion` when nothing committed). */
  def followOnce(coll: Collection, mirrorPath: String, seenVersion: Long,
      payloadCols: Seq[String] = Seq("user_id", "doc_id", "vector")): Long = {
    // lastOption: an opened path whose TOC history is missing/empty is
    // "nothing committed", not a NoSuchElementException
    val now = coll.versions.lastOption.getOrElse(seenVersion)
    if (now <= seenVersion) return seenVersion
    val snap = coll.snapshotAt(now) // pin the fetch target against expiry
    try {
      val delta = coll.changes(seenVersion, now).cache()
      try {
        val gone = delta.filter(col("change_type").isin("delete", "update"))
          .select(keyCols.map(col): _*)
        val ups = delta.filter(col("change_type").isin("insert", "update"))
          .select(keyCols.map(col): _*)
        // liveRowsFor is None only when the snapshot holds no rows at all
        // (everything deleted and vacuumed away) — then there is nothing
        // to fetch, and the mirror's pinned schema shapes the empty frame
        val fetched = snap.liveRowsFor(Some(ups))
          .map(_.select(payloadCols.map(col): _*))
          .getOrElse(CdcMirror.emptyFrame(coll.spark, mirrorPath))
        // applyDelta caches both inputs for its own multi-consumption —
        // the O(delta) fetch executes once per follow, not three times
        CdcMirror.applyDelta(coll.spark, mirrorPath, gone, fetched)
      } finally delta.unpersist()
      now
    } finally java.lang.ref.Reference.reachabilityFence(snap)
  }
}
