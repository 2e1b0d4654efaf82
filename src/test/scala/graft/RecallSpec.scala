package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** ANN quality harness (BASELINE.md: recall@10 vs brute-force oracle) on
  * the driver's real embedding table. */
class RecallSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IVF recall@10 on sf0.001 embeddings: probe-all exact, nprobe>=4 over 0.8") {
    val (centroids, postings) = Ann.ivfIndex(emb, numCentroids = 16)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    def recallAt(nprobe: Int): Double = {
      val scores = queries.map { case (qid, q) =>
        val oracle = Ann.bruteForceTopK(emb, q, 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = Ann.ivfTopK(emb, centroids, postings, q, 10, nprobe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        oracle.intersect(got).size.toDouble / 10.0
      }
      scores.sum / scores.length
    }
    assert(recallAt(16) === 1.0) // probe-all == exact
    val r4 = recallAt(4)
    assert(r4 >= 0.8, s"recall@10 with nprobe=4 was $r4")
  }

  test("knnGraph exact mode (probe-all) matches the brute-force kNN join") {
    val exact = Ann.knnJoin(
      emb.select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      emb, k = 5)
      .filter(col("q_id") =!= col("vec_id")) // knnJoin keeps self-matches
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id").orderBy("rank")))
      .filter(col("rank") <= 4)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val graph = Ann.knnGraph(emb, k = 4, numCentroids = 16, nprobe = 16)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(graph === exact)
  }

  test("knnGraph approximate (nprobe=4) edge recall over 0.8; self-edges togglable") {
    val exact = Ann.knnGraph(emb, k = 3, numCentroids = 16, nprobe = 16)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.knnGraph(emb, k = 3, numCentroids = 16, nprobe = 4)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"knn-graph edge recall with nprobe=4 was $recall")
    // includeSelf keeps the trivial self edge at rank 1 with dist 0
    val self = Ann.knnGraph(emb, k = 1, numCentroids = 16, nprobe = 16,
      includeSelf = true)
      .select("q_id", "vec_id", "dist", "rank").collect()
    assert(self.forall(r => r.getLong(0) == r.getLong(1) && r.getDouble(2) == 0.0))
  }

  test("knnClassify: planted clusters vote their own label, ties break to smallest") {
    // 3 tight clusters, label = cluster id; every query's 5 NN share its
    // cluster, so the vote must return the planted label
    val pts = (0 until 90).map { i =>
      val c = i % 3
      val v = (0 until 8).map(d =>
        (if (d % 3 == c) 5.0 else 0.0) + 0.01 * ((i * 31 + d * 17) % 7))
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "label")
    val queries = pts.filter(col("vec_id") < 9)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val got = Ann.knnClassify(queries, pts, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 9L).map(q => q -> q % 3).toMap)
    // self-exclusion: a 2-point corpus must predict the OTHER point's label
    val two = Seq((0L, Seq(1.0, 0.0), 7), (1L, Seq(1.0, 0.1), 3))
      .toDF("vec_id", "embedding", "label")
    val q0 = two.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    assert(Ann.knnClassify(q0, two, k = 1).head().getLong(1) === 3L)
  }

  test("seedAffinity: seed-cluster members outrank off-cluster rows") {
    val pts = (0 until 60).map { i =>
      val c = i % 3
      val v = (0 until 8).map(d =>
        (if (d % 3 == c) 5.0 else 0.0) + 0.01 * ((i * 31 + d * 17) % 7))
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "label")
    val scored = Ann.seedAffinity(pts, pts.filter(col("label") === 1))
      .orderBy(col("seed_cosine").desc, col("vec_id").asc)
      .select("vec_id", "label").collect()
    // the top third (seed-cluster size) is exactly the seed cluster
    assert(scored.take(20).forall(_.getInt(1) === 1))
    assert(scored.drop(20).forall(_.getInt(1) !== 1))
  }

  test("flagship entry() returns rows (the driver's t1 smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 10)
    assert(rows.head.schema.fieldNames.contains("vec_id"))
  }

  test("batched IVF search matches the per-query path") {
    val (centroids, postings) = Ann.ivfIndex(emb, numCentroids = 16)
    val queryDf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batch = Ann.ivfTopKBatch(queryDf, emb, centroids, postings, k = 5, nprobe = 4)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .flatMap { r =>
        Ann.ivfTopK(emb, centroids, postings, r.getSeq[Double](1), 5, 4)
          .select("vec_id").collect().map(_.getLong(0))
          .zipWithIndex.map { case (v, i) => (r.getLong(0), v, i + 1) }
      }.toSet
    assert(batch === single)
  }

  test("served per-query path matches Ann.ivfTopK exactly, at sub-Spark latency") {
    import graft.operators.ServedIvfIndex
    val (centroids, postings) = Ann.ivfIndex(emb, numCentroids = 16)
    val served = ServedIvfIndex.build(emb, centroids, postings)
    assert(served.numPoints === emb.count())
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    for ((qid, q) <- queries) {
      val oracle = Ann.ivfTopK(emb, centroids, postings, q.toSeq, 10, 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = served.search(q, 10, 4)
      assert(got.map(_._1).toSeq === oracle.map(_._1).toSeq, s"query $qid ids")
      got.zip(oracle).foreach { case ((_, d), (_, od)) =>
        assert(math.abs(d - od) < 1e-9, s"query $qid dist")
      }
    }
    // latency: the point of the serving path — well under the Spark job floor
    val warm = queries.head._2
    served.search(warm, 10, 4)
    val t0 = System.nanoTime()
    val reps = 50
    for (_ <- 0 until reps) served.search(warm, 10, 4)
    val perQueryMs = (System.nanoTime() - t0) / 1e6 / reps
    assert(perQueryMs < 100.0, s"served p50 ~${perQueryMs}ms; must be far below 1s")
  }

  test("served TopK sorts NaN distances last (engine-wide NaN-last invariant)") {
    import graft.operators.ServedIvfIndex
    val embNaN = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)),
      (3L, Seq(Double.NaN, 0.0)), (4L, Seq(3.0, 0.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(0.0, 0.0))).toDF("centroid_id", "vector")
    val posts = Seq((0, 1L), (0, 2L), (0, 3L), (0, 4L)).toDF("centroid_id", "point_id")
    val idx = ServedIvfIndex.build(embNaN, cents, posts)
    val got = idx.search(Array(0.0, 0.0), k = 4, nprobe = 1)
    // a raw < / > comparator would let the NaN entry lodge ahead of real
    // distances; NaN must rank greatest, after every finite distance
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 4L, 3L))
    assert(got.last._2.isNaN)
    assert(got.init.forall(!_._2.isNaN))
  }

  test("extensions: SQL functions available in a session built with GraftExtensions") {
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        "SELECT l2_distance(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d," +
          " rolling_hash('abc') AS h," +
          " size(window_hashes(array('a', 'b', 'c'), 2)) AS nw," +
          " window_hashes(array('a', 'b', 'c'), 2)[0].h AS w0").head()
      assert(r.getDouble(0) === 5.0)
      assert(r.getLong(1) === ((('a' * 1000003L) + 'b') * 1000003L) + 'c')
      assert(r.getInt(2) === 2) // 3 tokens, L=2 -> windows at pos 0 and 1
      assert(r.getLong(3) === 'a'.toLong * 1000003L + 'b'.toLong)
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }

  test("extensions: graft_ann TVF — a pure-SQL round trip of the minimum slice") {
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-tvf-test")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_tvf").toString
      val cfg = graft.core.CollectionConfig(
        name = "sqlcoll", numFeatures = 4, initialNumCentroids = 2)
      val coll = graft.core.Collection.create(s2, base, cfg)
      val rows = Seq.tabulate(20) { i =>
        (0L, i.toLong, Seq.tabulate(4)(d => (i * 4 + d).toDouble))
      }.toDF("user_id", "doc_id", "vector")
      coll.insert(rows); coll.flush()
      // SQL only from here: the TVF opens the collection and runs the
      // engine's snapshot search; compare against the Scala API result
      val sql = s2.sql(
        s"SELECT doc_id, round(score, 6) AS score FROM graft_ann('$base', 'sqlcoll', " +
          "array(8.1d, 9.1d, 10.1d, 11.1d), 3, 2) ORDER BY score, doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val api = coll.snapshot()
        .search(Seq(8.1, 9.1, 10.1, 11.1),
          graft.operators.SearchParams(topK = 3, numExploredCentroids = Some(2)))
        .selectExpr("doc_id", "round(score, 6) AS score")
        .orderBy("score", "doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(sql === api)
      assert(sql.head._1 === 2L) // nearest to the planted query
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }

  test("extensions: repeated identical graft_ann calls hit the memo (zero re-executions)") {
    // round-13 verdict #6: the TVF executes at analysis time, so EXPLAIN
    // and re-resolved CTEs re-ran the full search. The memo keyed on
    // (args, stateFingerprint) makes every repeat a driver map hit; a
    // mutation (flush) changes the fingerprint and re-executes.
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-tvf-memo-test")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      GraftExtensions.clearMemo()
      val base = java.nio.file.Files.createTempDirectory("graft_tvf_memo").toString
      val cfg = graft.core.CollectionConfig(
        name = "memocoll", numFeatures = 4, initialNumCentroids = 2)
      val coll = graft.core.Collection.create(s2, base, cfg)
      coll.insert(Seq.tabulate(20) { i =>
        (0L, i.toLong, Seq.tabulate(4)(d => (i * 4 + d).toDouble))
      }.toDF("user_id", "doc_id", "vector"))
      coll.flush()
      val sqlText = s"SELECT doc_id, round(score, 6) AS score FROM " +
        s"graft_ann('$base', 'memocoll', array(8.1d, 9.1d, 10.1d, 11.1d), 3, 2) " +
        "ORDER BY score, doc_id"
      val m0 = GraftExtensions.memoMisses.get()
      val first = s2.sql(sqlText).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(GraftExtensions.memoMisses.get() === m0 + 1)
      // EXPLAIN + an identical repeat: both resolve from the memo
      s2.sql(s"EXPLAIN $sqlText").collect()
      val second = s2.sql(sqlText).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(second === first)
      assert(GraftExtensions.memoMisses.get() === m0 + 1, "memo missed on a repeat")
      // the same call referenced twice in one query resolves cleanly
      // (fresh exprIds per resolution) and still costs zero re-executions
      val joined = s2.sql(
        s"WITH a AS (SELECT doc_id FROM graft_ann('$base', 'memocoll', " +
          "array(8.1d, 9.1d, 10.1d, 11.1d), 3, 2)) " +
          "SELECT x.doc_id FROM a x JOIN a y ON x.doc_id = y.doc_id")
        .collect()
      assert(joined.length === 3)
      // a mutation changes the fingerprint -> re-executes exactly once
      coll.insert(Seq((0L, 99L, Seq(8.1, 9.1, 10.1, 11.1)))
        .toDF("user_id", "doc_id", "vector"))
      coll.flush()
      val third = s2.sql(sqlText).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(GraftExtensions.memoMisses.get() >= m0 + 2, "stale memo served after a flush")
      assert(third.head._1 === 99L) // the new exact-match doc wins
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }

  test("extensions: graft_term_search TVF — HTTP-shape filter JSON incl. phrase, SQL == Scala") {
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-termsearch-tvf-test")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      GraftExtensions.clearMemo()
      val base = java.nio.file.Files.createTempDirectory("graft_tvf_ts").toString
      val cfg = graft.core.CollectionConfig(
        name = "tscoll", numFeatures = 2, initialNumCentroids = 2,
        attributeSchema = Seq(graft.core.AttrField("content", "text", "english")))
      val coll = graft.core.Collection.create(s2, base, cfg)
      coll.insert(Seq(
        (0L, 1L, Seq(1.0, 1.0), "hello world of search"),
        (0L, 2L, Seq(2.0, 2.0), "world hello reversed order"),
        (0L, 3L, Seq(3.0, 3.0), "hello world again here"),
        (0L, 4L, Seq(4.0, 4.0), "nothing relevant at all"))
        .toDF("user_id", "doc_id", "vector", "content"))
      coll.flush()
      def sqlIds(filterJson: String): Seq[Long] = s2.sql(
        s"SELECT doc_id FROM graft_term_search('$base', 'tscoll', '$filterJson', 10) " +
          "ORDER BY doc_id").collect().map(_.getLong(0)).toSeq
      // phrase: consecutive analyzed tokens only (doc 2 is reversed)
      assert(sqlIds("""{"phrase": {"field": "content", "value": "hello world"}}""")
        === Seq(1L, 3L))
      // the same JSON the HTTP surface takes: contains + and
      assert(sqlIds(
        """{"and": [{"contains": {"path": "content", "value": "hello"}},
                    {"contains": {"path": "content", "value": "again"}}]}""")
        === Seq(3L))
      // SQL == Scala on the identical filter
      val m0 = GraftExtensions.memoMisses.get()
      val viaSql = sqlIds("""{"near": {"field": "content", "left": "world", "right": "order", "window": 3}}""")
      val viaApi = coll.snapshot()
        .termSearch(graft.operators.DocFilter.Near("content", "world", "order", 3), 10)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(viaSql === viaApi && viaSql === Seq(2L))
      // repeat = memo hit, zero re-executions
      sqlIds("""{"near": {"field": "content", "left": "world", "right": "order", "window": 3}}""")
      assert(GraftExtensions.memoMisses.get() === m0 + 1, "memo missed on a repeat")
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }

  test("extensions: TVF memo is row-bounded — a huge limit executes but never caches") {
    // round-14 verdict #3: the memo bounded ENTRIES (64) but not bytes,
    // and graft_term_search's limit is caller-controlled — 64 memoized
    // limit=1M results would be driver-heap-sized. A result past the
    // row/byte cap must execute normally (same rows) but stay out of the
    // memo, while small results keep hitting.
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-tvf-memo-bound-test")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      GraftExtensions.clearMemo()
      val base = java.nio.file.Files.createTempDirectory("graft_tvf_memo").toString
      val cfg = graft.core.CollectionConfig(
        name = "bigcoll", numFeatures = 2, initialNumCentroids = 2,
        attributeSchema = Seq(graft.core.AttrField("content", "text", "english")))
      val coll = graft.core.Collection.create(s2, base, cfg)
      val n = GraftExtensions.memoMaxRows + 50
      coll.insert((0 until n).map(i =>
        (0L, i.toLong, Seq(i.toDouble, 1.0), "common token here"))
        .toDF("user_id", "doc_id", "vector", "content"))
      coll.flush()
      val matchAll = """{"contains": {"path": "content", "value": "common"}}"""
      def count(limit: Int): Long = s2.sql(
        s"SELECT count(*) AS c FROM graft_term_search('$base', 'bigcoll', '$matchAll', $limit)")
        .collect().head.getLong(0)
      val m0 = GraftExtensions.memoMisses.get()
      assert(count(n + 100) === n.toLong) // above the row cap: full result
      assert(count(n + 100) === n.toLong) // repeat re-executes (not cached)
      assert(GraftExtensions.memoMisses.get() === m0 + 2,
        "an above-cap result entered the memo")
      // small results still memoize across repeats
      assert(count(5) === 5L)
      assert(count(5) === 5L)
      assert(GraftExtensions.memoMisses.get() === m0 + 3,
        "a small repeat call missed the memo")
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }

  test("diverseSelect: covers every planted mode, deterministic, beats head-of-corpus coverage") {
    val r = new scala.util.Random(17)
    val centers = Array.fill(8)(Array.fill(12)(r.nextGaussian() * 4.0))
    // contiguous id blocks per cluster so "first m ids" is a bad cover
    val data = (0 until 400).map { id =>
      val c = centers(id / 50)
      (id.toLong, c.map(_ + r.nextGaussian() * 0.3).toSeq)
    }
    val emb = data.toDF("vec_id", "embedding").repartition(8)
    val picks = graft.operators.Ann.diverseSelect(emb, m = 16, numCentroids = 8, seed = 5L)
      .collect().map(r0 => (r0.getLong(0), r0.getInt(1), r0.getInt(2)))
    assert(picks.length === 16)
    // every planted mode is represented
    val modes = picks.map(_._1 / 50).toSet
    assert(modes.size === 8, s"covered modes: $modes")
    // deterministic
    val again = graft.operators.Ann.diverseSelect(emb, m = 16, numCentroids = 8, seed = 5L)
      .collect().map(r0 => (r0.getLong(0), r0.getInt(1), r0.getInt(2)))
    assert(picks.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // coverage radius: max over corpus of min distance to a pick
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    def radius(sel: Set[Long]): Double = data.map { case (_, v) =>
      data.filter(p => sel(p._1)).map(p => d2(v, p._2)).min
    }.max
    val rSel = radius(picks.map(_._1).toSet)
    val rHead = radius(data.take(16).map(_._1).toSet)
    assert(rSel < rHead / 4.0, s"diverse radius $rSel vs head $rHead")
    // quota flattening: alpha=0 on unequal clusters -> one per cluster at m=8
    val uneven = (0 until 330).map { id =>
      val c = centers(if (id < 300) 0 else (id - 300) / 10 + 1)
      (id.toLong, c.map(_ + r.nextGaussian() * 0.2).toSeq)
    }.toDF("vec_id", "embedding")
    val q = graft.operators.Ann.diverseSelect(uneven, m = 4, numCentroids = 4,
      alpha = 0.0, seed = 5L)
      .collect().map(r0 => r0.getInt(1))
    assert(q.length === 4 && q.toSet.size === 4, s"alpha=0 quotas: ${q.toSeq}")
  }
}
