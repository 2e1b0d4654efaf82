package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Hnsw, ServedIvfIndex}

/** HNSW centroid graph: exactness at full beam, recall at the reference's
  * ef, determinism, and the opt-in served stage-1 integration. */
class HnswSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic clustered points: `nClusters` planted directions plus
    * hash noise (same shape Scale uses, so recall is meaningful). */
  private def points(n: Int, dim: Int, nClusters: Int): Array[(Long, Array[Double])] =
    Array.tabulate(n) { i =>
      val c = i % nClusters
      val v = Array.tabulate(dim) { d =>
        val base = if (d % nClusters == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(i.toLong * 7919L + d)
        base + h.toDouble / Long.MaxValue.toDouble
      }
      (i.toLong, v)
    }

  private def bruteTopK(
      pts: Array[(Long, Array[Double])], q: Array[Double], k: Int): Seq[Long] =
    pts.map { case (id, v) =>
      var acc = 0.0
      var d = 0
      while (d < v.length) { val x = q(d) - v(d); acc += x * x; d += 1 }
      (acc, id)
    }.sortBy(identity).take(k).map(_._2).toSeq

  test("full-beam search is exact (equals brute force, same order)") {
    val pts = points(300, 8, 6)
    val g = Hnsw.build(pts.map(_._1), pts.map(_._2))
    for (qi <- Seq(0, 17, 123)) {
      val q = pts(qi)._2
      val got = g.search(q, 10, ef = 300).map(_._1).toSeq
      assert(got === bruteTopK(pts, q, 10), s"query $qi")
    }
    // distances come back as true l2 in (dist asc, id asc) order
    val res = g.search(pts(0)._2, 10, ef = 300)
    assert(res.head._1 === 0L && res.head._2 === 0.0)
    assert(res.map(_._2).toSeq === res.map(_._2).sorted.toSeq)
  }

  test("recall@10 >= 0.95 at ef=100 over 5000 clustered points") {
    val pts = points(5000, 16, 20)
    val g = Hnsw.build(pts.map(_._1), pts.map(_._2))
    val recalls = (0 until 25).map { qi =>
      val q = pts(qi * 37)._2
      val oracle = bruteTopK(pts, q, 10).toSet
      val got = g.search(q, 10, ef = 100).map(_._1).toSet
      oracle.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.95, s"mean recall@10 $mean")
  }

  test("deterministic: identical builds answer identically") {
    val pts = points(800, 8, 8)
    val g1 = Hnsw.build(pts.map(_._1), pts.map(_._2))
    val g2 = Hnsw.build(pts.map(_._1), pts.map(_._2))
    for (qi <- 0 until 20) {
      val q = pts(qi * 31)._2
      assert(g1.search(q, 10, 64).toSeq === g2.search(q, 10, 64).toSeq)
    }
  }

  test("parallel bulk build: deterministic across runs, recall holds") {
    val pts = points(5000, 16, 20)
    // determinism: thread scheduling must not leak into the graph — two
    // parallel builds answer identically, and because the bulk batch size
    // is a constant (not derived from the worker count), DIFFERENT
    // parallelism levels build the identical graph too: the same
    // persisted collection answers the same on any host core count
    val p1 = Hnsw.build(pts.map(_._1), pts.map(_._2), parallelism = 8)
    val p2 = Hnsw.build(pts.map(_._1), pts.map(_._2), parallelism = 8)
    val p3 = Hnsw.build(pts.map(_._1), pts.map(_._2), parallelism = 2)
    for (qi <- 0 until 20) {
      val q = pts(qi * 131)._2
      assert(p1.search(q, 10, 100).toSeq === p2.search(q, 10, 100).toSeq, s"query $qi")
      assert(p1.search(q, 10, 100).toSeq === p3.search(q, 10, 100).toSeq, s"query $qi p=2 vs p=8")
    }
    // recall gate at the same bar as the sequential build: batch-frozen
    // candidate searches may miss same-batch neighbors, the diversity
    // heuristic + warm-up prefix must absorb that
    val recalls = (0 until 25).map { qi =>
      val q = pts(qi * 37)._2
      val oracle = bruteTopK(pts, q, 10).toSet
      val got = p1.search(q, 10, ef = 100).map(_._1).toSet
      oracle.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.95, s"parallel-build mean recall@10 $mean")
  }

  test("persisted graph round-trip: loaded == built, stale file rejected") {
    val pts = points(3000, 16, 12)
    val g = Hnsw.build(pts.map(_._1), pts.map(_._2), parallelism = 4)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-rt")
    val path = dir.resolve("hnsw.bin").toString
    Hnsw.save(path, g)
    val loaded = Hnsw.load(path, pts.map(_._1), pts.map(_._2))
    assert(loaded.isDefined, "load of a just-saved graph must succeed")
    // golden: the loaded graph answers bit-identically to the built one
    // (same nodes, same links, same entry — not merely similar recall)
    for (qi <- 0 until 25) {
      val q = pts(qi * 113)._2
      assert(loaded.get.search(q, 10, 100).toSeq === g.search(q, 10, 100).toSeq, s"query $qi")
      // partial beams too — traversal order exercises the full topology
      assert(loaded.get.search(q, 5, 16).toSeq === g.search(q, 5, 16).toSeq, s"query $qi ef=16")
    }
    // stale-file guard: an id-set mismatch must refuse to load (the
    // caller then rebuilds) rather than serve a wrong graph
    val shifted = pts.map { case (id, v) => (id + 1, v) }
    assert(Hnsw.load(path, shifted.map(_._1), shifted.map(_._2)).isEmpty)
    // truncation guard
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val cut = dir.resolve("cut.bin")
    java.nio.file.Files.write(cut, raw.take(raw.length - 8))
    assert(Hnsw.load(cut.toString, pts.map(_._1), pts.map(_._2)).isEmpty)
  }

  test("corrupt file: neighbor at a level the target node lacks is rejected, not crashed on") {
    // hand-crafted v1 binary (same layout as writeGraph): 3 nodes, dim 2,
    // entry 0, top level 1. searchLayer dereferences layers(nb)(level) for
    // every visited neighbor, so a level-1 link to a node with only a
    // level-0 list must make load fall back to rebuild (None) — not load a
    // graph that throws ArrayIndexOutOfBounds mid-search.
    val ids = Array(10L, 11L, 12L)
    val vecs = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    def craft(level1Neighbor: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("hnsw-xlvl")
      val p = dir.resolve("hnsw.bin")
      val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(p))
      try {
        out.writeInt(0x47484e53); out.writeInt(1) // magic, version
        out.writeInt(3); out.writeInt(2)          // n, dim
        out.writeInt(0); out.writeInt(1)          // entry, top
        ids.foreach(out.writeLong)
        // node 0: levels 0+1; level-1 neighbor is the knob under test
        out.writeInt(2)
        out.writeInt(2); out.writeInt(1); out.writeInt(2) // L0: [1, 2]
        out.writeInt(1); out.writeInt(level1Neighbor)     // L1: [knob]
        // node 1: level 0 only
        out.writeInt(1)
        out.writeInt(2); out.writeInt(0); out.writeInt(2) // L0: [0, 2]
        // node 2: levels 0+1
        out.writeInt(2)
        out.writeInt(2); out.writeInt(0); out.writeInt(1) // L0: [0, 1]
        out.writeInt(1); out.writeInt(0)                  // L1: [0]
        out.writeInt(0x47484e53) // trailer
      } finally out.close()
      p.toString
    }
    // control: the same topology with a valid level-1 link loads fine,
    // proving rejection below is the cross-node check and not a layout bug
    val ok = Hnsw.load(craft(level1Neighbor = 2), ids, vecs)
    assert(ok.isDefined)
    assert(ok.get.search(Array(0.1, 0.1), 3, 10).length === 3)
    // corrupt: node 1 has no level-1 list
    assert(Hnsw.load(craft(level1Neighbor = 1), ids, vecs).isEmpty)
  }

  test("ragged input vectors are rejected at build, not zero-padded") {
    // zero-padding would silently skew distances AND leave a persisted
    // graph readGraph refuses to load (dim check) -> rebuild every restart
    val err = intercept[IllegalArgumentException] {
      Hnsw.build(Array(1L, 2L, 3L),
        Array(Array(1.0, 2.0), Array(3.0), Array(4.0, 5.0)))
    }
    assert(err.getMessage.contains("ragged"))
  }

  test("served hnsw mode: persisted path loads instead of rebuilding") {
    val emb = points(1500, 16, 10).toSeq
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val (centroids, postings) = Ann.ivfIndex(emb, numCentroids = 24)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-served")
    val path = dir.resolve("hnsw.bin").toString
    // first build persists the graph...
    val first = ServedIvfIndex.build(emb, centroids, postings,
      centroidIndex = "hnsw", hnswPath = Some(path))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "first hnsw build must persist the graph")
    // ...the restart loads it and answers identically
    val restart = ServedIvfIndex.build(emb, centroids, postings,
      centroidIndex = "hnsw", hnswPath = Some(path))
    val queries = (0 until 10).map(qi => points(1500, 16, 10)(qi * 97)._2)
    for (q <- queries)
      assert(restart.search(q, 10, nprobe = 6).toSeq === first.search(q, 10, nprobe = 6).toSeq)
  }

  test("served hnsw mode: full-probe parity with exact, partial-probe recall") {
    val emb = points(2000, 16, 10).toSeq
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val (centroids, postings) = Ann.ivfIndex(emb, numCentroids = 32)
    val exact = ServedIvfIndex.build(emb, centroids, postings)
    val hnsw = ServedIvfIndex.build(emb, centroids, postings, centroidIndex = "hnsw")
    val queries = (0 until 10).map(qi => points(2000, 16, 10)(qi * 101)._2)
    // probing every centroid: stage-1 order can't matter — bit-identical
    for (q <- queries)
      assert(hnsw.search(q, 10, nprobe = 32).toSeq === exact.search(q, 10, nprobe = 32).toSeq)
    // partial probe: approximate stage 1 must still find what exact finds
    val recalls = queries.map { q =>
      val o = exact.search(q, 10, nprobe = 8).map(_._1).toSet
      val g = hnsw.search(q, 10, nprobe = 8).map(_._1).toSet
      o.intersect(g).size.toDouble / math.max(1, o.size)
    }
    assert(recalls.sum / recalls.length >= 0.9,
      s"served hnsw stage-1 recall ${recalls.sum / recalls.length}")
  }

  test("hnswProbe: full-width probe equals brute-force centroid ranking") {
    // 32 well-separated centroids; ef >= n makes the layer-0 beam exhaustive,
    // so the probe must return exactly the nprobe nearest centroid ids
    val cents = Seq.tabulate(32) { i =>
      (i.toLong, Array.tabulate(8)(j => (i * 8 + j).toDouble))
    }
    val cdf = cents.toDF("centroid_id", "vector")
    val q = Array.tabulate(8)(j => (5 * 8 + j).toDouble + 0.25)
    val got = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4, ef = 64)
    val want = cents
      .map { case (id, v) =>
        (math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum), id)
      }
      .sorted.take(4).map(_._2)
    assert(got.toSeq === want.toSeq)
  }

  test("hnswProbe restart path: loads the persisted graph, answers equal the build path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hnswprobe").toString
    val rng = new scala.util.Random(11)
    val cents = Seq.tabulate(24) { i =>
      (i.toLong, Array.fill(8)(rng.nextDouble()))
    }
    val cdf = cents.toDF("centroid_id", "vector")
    val q = Array.fill(8)(rng.nextDouble())
    val fresh = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4)          // build path
    val built = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4, binDir = Some(dir)) // build + save
    val bins = new java.io.File(dir).listFiles()
    assert(bins != null && bins.length == 1, "expected one persisted hnsw bin")
    val mtime = bins(0).lastModified
    Thread.sleep(5)
    val loaded = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4, binDir = Some(dir)) // load
    assert(bins(0).lastModified === mtime, "second probe must LOAD, not rebuild+resave")
    assert(built.toSeq === fresh.toSeq && loaded.toSeq === fresh.toSeq)
    // content change with the SAME ids must miss the hash key (a new bin
    // appears) instead of serving stale links
    val cdf2 = cents.map { case (id, v) => (id, v.map(_ + 1.0)) }
      .toDF("centroid_id", "vector")
    Ann.hnswProbe(cdf2, q.toSeq, nprobe = 4, binDir = Some(dir))
    assert(new java.io.File(dir).listFiles().length == 2,
      "changed vectors with same ids must key a NEW persisted graph")
  }

  test("hnswProbe cacheKey: a warm re-probe runs ZERO Spark jobs") {
    val rng = new scala.util.Random(23)
    val cents = Seq.tabulate(24) { i =>
      (i.toLong, Array.fill(8)(rng.nextDouble()))
    }
    val cdf = cents.toDF("centroid_id", "vector")
    val q = Array.fill(8)(rng.nextDouble())
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val key = Some(s"hnswspec-resident-${System.nanoTime()}")
    val first = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4, cacheKey = key)
    spark.sparkContext.addSparkListener(listener)
    try {
      val warm = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4, cacheKey = key)
      // listener events are async — give the bus a moment to drain; a
      // false negative here would need a job START to lag >1s, and the
      // assert is jobs == 0 so late events only make it stricter to pass
      Thread.sleep(1000)
      assert(warm.toSeq === first.toSeq)
      assert(jobs.get() === 0,
        s"warm resident probe launched ${jobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // a DIFFERENT key must not serve the resident graph of another set
    val other = Ann.hnswProbe(cdf, q.toSeq, nprobe = 4,
      cacheKey = Some(s"hnswspec-other-${System.nanoTime()}"))
    assert(other.toSeq === first.toSeq)
  }
}
