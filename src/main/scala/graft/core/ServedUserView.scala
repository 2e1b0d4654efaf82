package graft.core

import org.apache.spark.sql.functions._

import graft.operators.ServedIvfIndex

/** Per-user online serving view of a collection — the engine-level
  * analogue of the reference's per-user index loading
  * (rs/index_server/src/collection_manager.rs:27-94: a search names its
  * users and the server serves from their in-memory indexes).
  *
  * `Collection.serveUser` pins the current TOC and loads, ONCE, the named
  * user's slice of every segment (bucket-pruned scans) into driver-memory
  * [[ServedIvfIndex]] structures, plus the user's unflushed tail rows and
  * tombstones. Single queries are then answered with zero Spark jobs:
  * per-segment in-memory probes + a brute-force scan of the tail
  * (read-your-writes, R5), tombstones dropped, merged by the engine's
  * (score asc, doc_id asc) order. Memory is bounded by one user's data —
  * the per-shard posture of the reference, not corpus-sized.
  */
final class ServedUserView private[core] (
    segments: Seq[(ServedIvfIndex, Map[Long, Any])], // index + pointId -> docId
    tailRows: Array[(Any, Array[Double])]) { // (docId, vector)

  /** Unsigned-lexicographic for BinaryType ids, natural for Long ids —
    * matches Spark's sort order on the corresponding column types. */
  private def idLess(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Array[Byte], y: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(x, y) < 0
    case _ => a.toString < b.toString
  }

  private def l2(q: Array[Double], v: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(q.length, v.length)
    while (i < n) { val d = q(i) - v(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  /** Single-query top-k over segments + tail, zero Spark jobs. */
  def search(query: Array[Double], k: Int, nprobe: Int): Seq[(Any, Double)] = {
    val fromSegments = segments.iterator.flatMap { case (idx, docOf) =>
      idx.search(query, k, nprobe).iterator.flatMap { case (pid, dist) =>
        docOf.get(pid).map(doc => (doc, dist))
      }
    }
    val fromTail = tailRows.iterator.map { case (doc, v) => (doc, l2(query, v)) }
    // java.lang.Double.compare gives the total order with NaN greatest —
    // the engine's (score asc NaN-last, doc_id asc) invariant — and keeps
    // the comparator a strict weak ordering (a raw < on NaN is not)
    val ord = new Ordering[(Any, Double)] {
      def compare(x: (Any, Double), y: (Any, Double)): Int = {
        val c = java.lang.Double.compare(x._2, y._2)
        if (c != 0) c
        else if (idLess(x._1, y._1)) -1
        else if (idLess(y._1, x._1)) 1
        else 0
      }
    }
    (fromSegments ++ fromTail)
      .toArray
      .sorted(ord)
      .take(k)
      .toSeq
  }
}

object ServedUserView {

  private[core] def build(coll: Collection, userId: Any): ServedUserView = {
    val t = coll.toc
    val uid = lit(userId)
    // Tombstones are removed BEFORE the per-segment indexes are built:
    // ServedIvfIndex.search truncates to k per segment, so a deleted doc
    // left in the index would silently displace a live doc ranked k+1 —
    // the distributed path (Search.spann) anti-joins before ranking and
    // this view must stay in parity with it. The anti-join is SEQUENCED
    // (Search.dropTombstoned): a doc re-inserted after its delete is live,
    // so it must run while rows still carry src_batch (before the select).
    val userTombs = coll.tombstones.map(_.filter(col("user_id") === uid))
    def dropTombs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      userTombs.fold(df)(tb => graft.operators.Search.dropTombstoned(df, tb))
    val segs = t.segments.map { seg =>
      val userVecs = dropTombs(coll.vectorsFor(seg, Seq(userId))
        .filter(col("user_id") === uid))
        .select(col("point_id").cast("long").as("vec_id"),
          col("doc_id"), col("vector").cast("array<double>").as("embedding"))
      // postings referencing dropped points are dangling; ServedIvfIndex
      // .build discards posting entries with no backing vector
      // Stage-1 selector follows the collection config; with "hnsw" the
      // flush-time hnsw.bin loads here (seconds) instead of rebuilding
      // the centroid graph on every serving (re)start.
      val served = ServedIvfIndex.build(
        userVecs.select("vec_id", "embedding"),
        coll.segmentTable(seg, "centroids"),
        coll.segmentTable(seg, "postings").filter(col("user_id") === uid),
        centroidIndex = coll.config.centroidIndexType,
        hnswPath = Some(coll.segmentFile(seg, "hnsw.bin")))
      val docOf: Map[Long, Any] = userVecs.select("vec_id", "doc_id").collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      (served, docOf)
    }
    val tailRows: Array[(Any, Array[Double])] = coll.tailFor(t) match {
      case None => Array.empty
      case Some(rows) =>
        dropTombs(rows.filter(col("user_id") === uid))
          .select(col("doc_id"), col("vector").cast("array<double>"))
          .collect()
          .map(r => (r.get(0), r.getSeq[Double](1).toArray))
    }
    new ServedUserView(segs, tailRows)
  }
}
