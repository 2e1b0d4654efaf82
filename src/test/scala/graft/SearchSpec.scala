package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Search-pipeline semantics on the reference's own fixture: line vectors
  * [i,i,i,i], query [2.4,3.4,4.4,5.4] => doc_ids [4,3]
  * (rs/index/src/spann/index.rs:330-365; FIXTURES.md §1.2). */
class SearchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val lineVectors = (0 until 1000).map { i =>
    (0L, i.toLong, i.toLong + 1, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
  }.toDF("user_id", "doc_id", "point_id", "vector")

  private val query = Seq(2.4, 3.4, 4.4, 5.4)

  test("brute force: golden neighbors [4,3]") {
    val got = Search.bruteForce(lineVectors, query, k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(4L, 3L))
  }

  test("IVF probe-all equals brute force (recall 1.0 oracle knob)") {
    val params = IvfBuilder.BuildParams(numCentroids = 10, seed = 7L)
    val centroids = IvfBuilder.buildCentroids(lineVectors, params)
    val postings = IvfBuilder.buildPostings(lineVectors, centroids, params)
    val nc = centroids.count().toInt
    val got = Search.spann(lineVectors, centroids, postings, query,
      SearchParams(topK = 10, numExploredCentroids = Some(nc), centroidDistanceRatio = 1e9))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val oracle = Search.bruteForce(lineVectors, query, k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === oracle)
  }

  test("SPANN with default pruning still finds the golden neighbors") {
    val params = IvfBuilder.BuildParams(numCentroids = 10, seed = 7L)
    val centroids = IvfBuilder.buildCentroids(lineVectors, params)
    val postings = IvfBuilder.buildPostings(lineVectors, centroids, params)
    val got = Search.spann(lineVectors, centroids, postings, query,
      SearchParams(topK = 2, numExploredCentroids = Some(2)))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(4L, 3L))
  }

  test("ratio prune is inert when the query coincides with its nearest centroid") {
    // a singleton cluster's centroid IS its point, so a query equal to it
    // gives mind = 0 and the multiplicative band `cdist <= mind*(1+ratio)`
    // degenerates — before the round-16 fix, EVERY other centroid was
    // pruned regardless of the ratio (an exhaustive 1e18-ratio search
    // returned one point; calibration queries are sampled corpus vectors,
    // so this was reachable there too). At mind = 0 the prune must fall
    // back to pure nprobe.
    val two = Seq(
      (0L, 1L, 1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (0L, 2L, 2L, Seq(5.0, 6.0, 7.0, 8.0)))
      .toDF("user_id", "doc_id", "point_id", "vector")
    val cents = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0)), (1L, Seq(5.0, 6.0, 7.0, 8.0)))
      .toDF("centroid_id", "vector")
    val posts = Seq((0L, 0L, 1L), (0L, 1L, 2L))
      .toDF("user_id", "centroid_id", "point_id")
    val got = Search.spann(two, cents, posts, Seq(1.0, 2.0, 3.0, 4.0),
      SearchParams(topK = 5, numExploredCentroids = Some(2),
        centroidDistanceRatio = 1e18))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L))
    // nprobe = 1 still restricts to the nearest list (the prune fallback
    // never widens the probe set past nprobe)
    val one = Search.spann(two, cents, posts, Seq(1.0, 2.0, 3.0, 4.0),
      SearchParams(topK = 5, numExploredCentroids = Some(1),
        centroidDistanceRatio = 1e18))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(one === Seq(1L))
  }

  test("every point lands in at least one posting list (builder invariant)") {
    val params = IvfBuilder.BuildParams(numCentroids = 10, seed = 7L)
    val centroids = IvfBuilder.buildCentroids(lineVectors, params)
    val postings = IvfBuilder.buildPostings(lineVectors, centroids, params)
    assert(postings.select("point_id").distinct().count() === 1000L)
  }

  test("balanced split caps posting-list size") {
    val params = IvfBuilder.BuildParams(
      numCentroids = 2, maxPostingListSize = 200, sampleSize = 1000, seed = 7L)
    val centroids = IvfBuilder.buildCentroids(lineVectors, params)
    val postings = IvfBuilder.buildPostings(lineVectors, centroids, params)
    val maxSize = postings.groupBy("centroid_id").count()
      .agg(max("count")).head().getLong(0)
    // multi-assignment can overshoot slightly; nearest-only sizing is capped
    assert(centroids.count() >= 5) // 1000/200
    assert(maxSize <= 400) // 2x slack for threshold multi-assignment
  }

  test("pruned two-level assignment: full coverage and high agreement with exact") {
    val params = IvfBuilder.BuildParams(numCentroids = 64, sampleSize = 1000, seed = 7L)
    val centroids = IvfBuilder.buildCentroids(lineVectors, params)
    val exact = IvfBuilder.buildPostings(lineVectors, centroids, params)
    val pruned = IvfBuilder.buildPostings(lineVectors, centroids,
      params.copy(assignProbeGroups = 4))
    // invariant: every point still assigned
    assert(pruned.select("point_id").distinct().count() === 1000L)
    // near-exact: overwhelming agreement with the exact assignment
    val e = exact.select("centroid_id", "point_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val p = pruned.select("centroid_id", "point_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val agree = e.intersect(p).size.toDouble / e.size
    assert(agree >= 0.95, s"pruned assignment agreement $agree")
  }

  test("tombstones excluded, filter semi-join applied, NaN-last ordering") {
    val tomb = Seq((0L, 4L)).toDF("user_id", "doc_id")
    val got = Search.bruteForce(lineVectors, query, k = 2, tombstones = Some(tomb))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 5L)) // 4 tombstoned; next best are 3 (8.24) then 5 (9.84)

    val fp = Seq((0L, 8L), (0L, 9L)).toDF("user_id", "point_id") // docs 7,8
    val got2 = Search.bruteForce(lineVectors, query, k = 2, filterPoints = Some(fp))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got2 === Seq(7L, 8L))
  }

  test("tombstone anti-join is not forced broadcast (AQE decides)") {
    // an unbounded tombstone table must never carry a broadcast hint —
    // with the auto threshold off, the plan must contain no
    // BroadcastExchange (AQE may still choose one at runtime from stats)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val tomb = Seq((0L, 4L)).toDF("user_id", "doc_id")
      val df = Search.bruteForce(lineVectors, query, k = 2, tombstones = Some(tomb))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"), s"forced broadcast in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("multi-user: results restricted to requested users") {
    val mu = (0 until 100).map { i =>
      ((i % 5).toLong, i.toLong, (i / 5).toLong + 1,
        Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
    }.toDF("user_id", "doc_id", "point_id", "vector")
    val got = Search.bruteForce(mu, Seq(0.0, 0.0, 0.0, 0.0), k = 3, userIds = Seq(2L))
      .select("user_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.forall(_._1 == 2L))
    assert(got.map(_._2) === Seq(2L, 7L, 12L))
  }

  test("rrfFuse: hand-computed fusion, single-list ids contribute once") {
    // list A ranks 1,2,3 for ids 10,20,30; list B ranks 1,2 for ids 20,40
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(20L) === ((r6(1.0 / 62 + 1.0 / 61), 2L))) // in both lists
    assert(got(10L) === ((r6(1.0 / 61), 1L)))
    assert(got(40L) === ((r6(1.0 / 62), 1L)))
    assert(got(30L) === ((r6(1.0 / 63), 1L)))
    // the doubly-ranked id wins overall
    val top = Search.rrfFuse(Seq(a, b), k = 1).head()
    assert(top.getLong(0) === 20L)
  }

  test("maxSimTopK: hand-computed late-interaction scores, planted best doc") {
    import graft.operators.Search
    // doc 0 tokens cover BOTH query directions; doc 1 covers one twice;
    // doc 2 is orthogonal
    val docTokens = Seq(
      (0L, Seq(1.0, 0.0)), (0L, Seq(0.0, 1.0)),
      (1L, Seq(0.9, 0.0)), (1L, Seq(0.8, 0.0)),
      (2L, Seq(0.0, 0.0))
    ).toDF("doc_id", "embedding")
    val q = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val got = Search.maxSimTopK(docTokens, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // doc0: max(1,0)+max(0,1)=2; doc1: max(.9,.8)+0=0.9; doc2: 0
    assert(got === Seq((0L, 2.0), (1L, 0.9), (2L, 0.0)))
    // parity with a driver-side reference on random data
    val r = new scala.util.Random(13)
    val data = (0 until 60).map(i => (i.toLong % 12, Seq.fill(6)(r.nextGaussian())))
    val qs = Seq.fill(3)(Seq.fill(6)(r.nextGaussian()))
    val spark2 = Search.maxSimTopK(data.toDF("doc_id", "embedding"), qs, k = 12)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val ref = data.groupBy(_._1).map { case (d, rows) =>
      d -> qs.map(qv => rows.map(t => t._2.zip(qv).map(p => p._1 * p._2).sum).max).sum
    }
    ref.foreach { case (d, want) =>
      assert(math.abs(spark2(d) - want) < 1e-9, s"doc $d")
    }
  }
}
