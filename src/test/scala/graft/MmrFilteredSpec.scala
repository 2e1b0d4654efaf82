package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Collection, CollectionConfig}
import graft.operators.{Ann, Search}

/** MMR reranking (`Search.mmrRerank`), selectivity-adaptive filtered ANN
  * (`Ann.ivfTopKFiltered`), and the CDC consumer fetch path
  * (`Snapshot.liveRows`). */
class MmrFilteredSpec extends SparkSuite {
  import spark.implicits._

  // two tight 2-D clusters: A hugs the query direction (high relevance),
  // B is orthogonal (low relevance, maximally diverse from A)
  private def clustered() = Seq(
    (1L, Seq(1.00, 0.00)), (2L, Seq(0.99, 0.01)), (3L, Seq(0.98, 0.02)),
    (10L, Seq(0.00, 1.00)), (11L, Seq(0.01, 0.99)), (12L, Seq(0.02, 0.98))
  ).toDF("vec_id", "vector")

  private def withRel(df: org.apache.spark.sql.DataFrame, q: Seq[Double]) = {
    import graft.functions.GraftFunctions._
    df.withColumn("rel", cosine_similarity(col("vector").cast("array<double>"), vec(q)))
  }

  // query off every point's direction (a query ON a candidate makes
  // rel − sim cancel exactly for all others at lambda 0.5)
  private val q2 = Seq(1.0, 0.2)

  test("mmr: lambda = 1.0 degenerates to pure relevance order") {
    val picks = Search.mmrRerank(withRel(clustered(), q2), k = 4, lambda = 1.0)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // cosine to (1, 0.2): 3 > 2 > 1 > the orthogonal cluster
    assert(picks === Seq(3L, 2L, 1L, 12L))
  }

  test("mmr: lambda = 0.5 jumps clusters where pure relevance would not") {
    val picks = Search.mmrRerank(withRel(clustered(), q2), k = 2, lambda = 0.5)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // pick 1 = most relevant (id 3); pick 2 must leave cluster A:
    // sim(*, 3) ~ 1.0 inside A turns its margin negative at lambda 0.5
    assert(picks.head === 3L)
    assert(Seq(10L, 11L, 12L).contains(picks(1)))
  }

  test("mmr: duplicate vectors tie-break on the smaller id") {
    val q = Seq(1.0, 0.0)
    val dups = Seq(
      (7L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)), (5L, Seq(0.0, 1.0))
    ).toDF("vec_id", "vector")
    val picks = Search.mmrRerank(withRel(dups, q), k = 3, lambda = 0.5)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(picks === Seq(3L, 5L, 7L)) // 3 before 7 (tie), 5 is diverse
  }

  test("mmr: NaN relevance ranks last instead of crashing the rerank") {
    // BigDecimal(NaN) throws NumberFormatException — a degenerate
    // candidate must follow the NaN-last convention, not kill the query
    val cands = Seq(
      (1L, Seq(1.0, 0.0), 0.9),
      (2L, Seq(0.0, 1.0), Double.NaN),
      (3L, Seq(0.5, 0.5), 0.8)
    ).toDF("vec_id", "vector", "rel")
    val picks = Search.mmrRerank(cands, k = 3, lambda = 1.0)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(picks === Seq(1L, 3L, 2L)) // NaN rel last
  }

  test("mmr: +Infinity relevance ranks last too (no Infinity in the output)") {
    // +Inf passing through the rounding would WIN the argmax and surface
    // an Infinity score downstream — all non-finite rel ranks last
    val cands = Seq(
      (1L, Seq(1.0, 0.0), 0.9),
      (2L, Seq(0.0, 1.0), Double.PositiveInfinity),
      (3L, Seq(0.5, 0.5), 0.8)
    ).toDF("vec_id", "vector", "rel")
    val got = Search.mmrRerank(cands, k = 3, lambda = 1.0)
      .orderBy("rank").select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 3L, 2L))
    assert(got.head._2 === 0.9) // rank 1 carries the finite max, not Inf
  }

  test("mmr: caps the candidate set") {
    val q = Seq(1.0, 0.0)
    intercept[IllegalArgumentException] {
      Search.mmrRerank(withRel(clustered(), q), k = 2, maxCandidates = 3)
    }
  }

  private def grid(n: Int) = (0 until n).map { i =>
    (i.toLong, Seq(i.toDouble, (i % 7).toDouble, (i % 3).toDouble))
  }.toDF("vec_id", "embedding")

  test("filtered ANN: selective filter routes to the exact branch and is exact") {
    val emb = grid(200)
    val (c, p) = Ann.ivfIndex(emb, numCentroids = 8)
    val filt = emb.filter(col("vec_id") % 41 === 0).select("vec_id") // 5 ids
    val q = Seq(60.0, 3.0, 1.0)
    val got = Ann.ivfTopKFiltered(emb, c, p, q, k = 3, nprobe = 1,
        filterIds = filt, bruteForceThreshold = 10)
      .select("vec_id").as[Long].collect().toSet
    val want = Ann.bruteForceTopK(emb.join(filt, Seq("vec_id"), "left_semi"), q, 3)
      .select("vec_id").as[Long].collect().toSet
    assert(got === want)
    // nprobe=1 post-filter probe would have missed ids outside the one
    // nearest list — the adaptive branch is what makes this exact
  }

  test("filtered ANN: dense branch equals the exact branch at exhaustive nprobe") {
    val emb = grid(200)
    val (c, p) = Ann.ivfIndex(emb, numCentroids = 8)
    val filt = emb.filter(col("vec_id") % 2 === 0).select("vec_id") // 100 ids
    val q = Seq(60.0, 3.0, 1.0)
    // threshold 0 forces the probe branch; exhaustive nprobe makes it exact
    val probe = Ann.ivfTopKFiltered(emb, c, p, q, k = 5, nprobe = 8,
        filterIds = filt, bruteForceThreshold = 0)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Ann.ivfTopKFiltered(emb, c, p, q, k = 5, nprobe = 8,
        filterIds = filt, bruteForceThreshold = 1000000)
      .select("vec_id").as[Long].collect().toSeq
    assert(probe === exact)
  }

  test("filtered ANN: branch choice flips at the threshold") {
    val ids = (0L until 50L).toDF("vec_id")
    assert(Ann.chooseBruteForce(ids, 50))
    assert(Ann.chooseBruteForce(ids, 1000))
    assert(!Ann.chooseBruteForce(ids, 49))
  }

  // ---- liveRows: the CDC consumer's fetch side ----

  private def rows4(ids: Seq[Long]) = ids.map { i =>
    (0L, i, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
  }.toDF("user_id", "doc_id", "vector")

  test("liveRows carries the newest surviving payload across a delete + revive") {
    val base = Files.createTempDirectory("graft_lr").toString
    val coll = Collection.create(spark, base,
      CollectionConfig(name = "lr", numFeatures = 4, initialNumCentroids = 4))
    coll.insert(rows4(0L until 10L)); coll.flush()            // v1
    coll.delete(rows4(Seq(3L)).select("user_id", "doc_id"))
    // revive 3 with a DIFFERENT payload — liveRows must return the new one
    coll.insert(Seq((0L, 3L, Seq(9.0, 9.0, 9.0, 9.0))).toDF("user_id", "doc_id", "vector"))
    coll.flush()                                              // v2

    val live = coll.snapshot().liveRows.get
      .select("doc_id", "vector").as[(Long, Seq[Double])].collect().toMap
    assert(live.keySet === (0L until 10L).toSet)
    assert(live(3L) === Seq(9.0, 9.0, 9.0, 9.0))
    assert(live(4L) === Seq(4.0, 4.0, 4.0, 4.0))

    // keys agree with liveDocs (the diff basis) at every version
    Seq(1L, 2L).foreach { v =>
      val snap = coll.snapshotAt(v)
      val a = snap.liveRows.get.select("doc_id").as[Long].collect().toSet
      val b = snap.liveDocs.get.select("doc_id").as[Long].collect().toSet
      assert(a === b, s"version $v")
    }

    // the pre-window key restriction returns exactly the filtered rows
    // (same newest-payload semantics — including the revived doc 3)
    val keys = Seq((0L, 3L), (0L, 7L), (0L, 99L)).toDF("user_id", "doc_id")
    val restricted = coll.snapshot().liveRowsFor(Some(keys))
      .get.select("doc_id", "vector").as[(Long, Seq[Double])].collect().toMap
    assert(restricted.keySet === Set(3L, 7L)) // 99 doesn't exist
    assert(restricted(3L) === Seq(9.0, 9.0, 9.0, 9.0))
    assert(restricted(7L) === live(7L))
  }

  test("a changes()-driven mirror converges to the target snapshot") {
    val base = Files.createTempDirectory("graft_mirror").toString
    val coll = Collection.create(spark, base,
      CollectionConfig(name = "mir", numFeatures = 4, initialNumCentroids = 4))
    coll.insert(rows4(0L until 12L)); coll.flush()            // v1
    coll.insert(rows4(12L until 16L))
    coll.delete(rows4(Seq(1L, 5L)).select("user_id", "doc_id"))
    coll.flush()                                              // v2
    coll.merge()                                              // v3
    coll.insert(Seq((0L, 5L, Seq(7.0, 7.0, 7.0, 7.0))).toDF("user_id", "doc_id", "vector"))
    coll.flush()                                              // v4

    var mirror = coll.snapshotAt(1L).liveRows.get.select("doc_id", "vector")
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).foreach { case (f, t) =>
      val delta = coll.changes(f, t)
      val gone = delta.filter(col("change_type").isin("delete", "update")).select("doc_id")
      val ups = delta.filter(col("change_type").isin("insert", "update")).select("user_id", "doc_id")
      val fetched = coll.snapshotAt(t).liveRowsFor(Some(ups)).get
        .select("doc_id", "vector")
      mirror = mirror.join(gone, Seq("doc_id"), "left_anti").unionByName(fetched)
    }
    val got = mirror.as[(Long, Seq[Double])].collect().toMap
    val want = coll.snapshotAt(4L).liveRows.get
      .select("doc_id", "vector").as[(Long, Seq[Double])].collect().toMap
    assert(got === want)
    assert(got(5L) === Seq(7.0, 7.0, 7.0, 7.0)) // the revived payload, not the original
    assert(!got.contains(1L))
  }
}
