package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.{Collection, CollectionConfig}
import graft.operators.SearchParams

/** Recall-targeted search calibration (round-14 verdict #6 — beyond the
  * reference, whose nprobe heuristic is just top_k): the ANALYTIC curve
  * must equal the recall real unpruned searches deliver at each probe
  * depth, and targetRecall resolution must pick the smallest adequate
  * nprobe. */
class CalibrationSpec extends SparkSuite {
  import spark.implicits._

  // 8 well-separated clusters of 40 vectors → 16 centroids: nprobe=1
  // misses cross-boundary neighbors, deep probes recover them — a curve
  // with real shape, not a step
  private def clustered(n: Int = 320, dim: Int = 6): Seq[(Long, Long, Seq[Double])] = {
    val r = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(dim)(r.nextGaussian() * 8.0))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (0L, i.toLong, c.map(_ + r.nextGaussian() * 1.5).toSeq)
    }
  }

  private def build(): (Collection, String) = {
    val base = Files.createTempDirectory("graft_cal").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "cal", numFeatures = 6, initialNumCentroids = 16))
    coll.insert(clustered().toDF("user_id", "doc_id", "vector"))
    coll.flush()
    (coll, base)
  }

  test("analytic curve == real unpruned search recall at every ladder depth") {
    val (coll, _) = build()
    val ladder = Seq(1, 2, 4, 8, 16)
    val k = 5
    val nQ = 8
    val curve = coll.calibrateRecall(k = k, nQueries = nQ, ladder = ladder).toMap
    val snap = coll.snapshot()
    val sample = snap.liveRows.get.select("doc_id", "vector")
      .orderBy("user_id", "doc_id").limit(nQ)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val exhaustive = SearchParams(topK = k,
      numExploredCentroids = Some(Int.MaxValue), centroidDistanceRatio = 1e18)
    for (p <- ladder) {
      val real = sample.map { case (_, v) =>
        val truth = snap.search(v, exhaustive)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val got = snap.search(v, SearchParams(topK = k,
          numExploredCentroids = Some(p), centroidDistanceRatio = 1e18))
          .select("doc_id").collect().map(_.getLong(0)).toSet
        truth.intersect(got).size.toDouble / truth.size
      }
      val realRecall = real.sum / real.length
      assert(math.abs(realRecall - curve(p)) < 1e-9,
        s"nprobe=$p: analytic ${curve(p)} vs real $realRecall")
    }
    // probing every centroid is exhaustive — the curve tops out at 1.0
    assert(curve(16) === 1.0)
    // monotone non-decreasing in depth
    val sorted = ladder.map(curve)
    assert(sorted === sorted.sorted)
  }

  test("curve stays exact under tombstones + re-inserts (live rows only)") {
    // the review-pass bug this pins: ranking RAW segment postings lets a
    // tombstoned old version report a shallower centroid rank than any
    // LIVE row achieves — the curve overestimates and targetRecall
    // under-delivers. Delete 40 docs and re-insert them FAR away (new
    // segment, new centroids); the dead postings still sit in seg_1.
    val (coll, _) = build()
    coll.delete((0L until 40L).map(i => (0L, i)).toDF("user_id", "doc_id"))
    val r = new scala.util.Random(13)
    coll.insert((0L until 40L).map(i =>
      (0L, i, Seq.fill(6)(50.0 + r.nextGaussian())))
      .toDF("user_id", "doc_id", "vector"))
    coll.flush() // seg_2: the revived docs' only LIVE rows
    val k = 5; val nQ = 8
    val ladder = Seq(1, 2, 4, 16)
    val curve = coll.calibrateRecall(k = k, nQueries = nQ, ladder = ladder).toMap
    val snap = coll.snapshot()
    val sample = snap.liveRows.get.select("doc_id", "vector")
      .orderBy("user_id", "doc_id").limit(nQ)
      .collect().map(r0 => (r0.getLong(0), r0.getSeq[Double](1)))
    val exhaustive = SearchParams(topK = k,
      numExploredCentroids = Some(Int.MaxValue), centroidDistanceRatio = 1e18)
    for (p <- ladder) {
      val real = sample.map { case (_, v) =>
        val truth = snap.search(v, exhaustive)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val got = snap.search(v, SearchParams(topK = k,
          numExploredCentroids = Some(p), centroidDistanceRatio = 1e18))
          .select("doc_id").collect().map(_.getLong(0)).toSet
        truth.intersect(got).size.toDouble / truth.size
      }
      val realRecall = real.sum / real.length
      assert(math.abs(realRecall - curve(p)) < 1e-9,
        s"nprobe=$p under tombstones: analytic ${curve(p)} vs real $realRecall")
    }
  }

  test("targetRecall resolves to the smallest adequate nprobe; explicit wins; tail always found") {
    val (coll, base) = build()
    val curve = coll.calibrateRecall(k = 5, nQueries = 8,
      ladder = Seq(1, 2, 4, 8, 16))
    // persisted file exists with the CONFIG-style terminator
    val body = Files.readString(Paths.get(s"$base/cal/CALIBRATION"))
    assert(body.contains("curve=") && body.endsWith("end=1\n"))
    val t = 0.9
    val resolved = coll.nprobeFor(t)
    val adequate = curve.filter(_._2 >= t)
    assert(adequate.nonEmpty, s"test corpus must reach $t somewhere: $curve")
    assert(resolved === adequate.head._1, "must pick the SMALLEST adequate depth")
    // a target above the ceiling serves best-effort at the deepest depth
    assert(coll.nprobeFor(2.0) === curve.last._1)
    // search with targetRecall == search with (resolved nprobe, ratio off)
    val snap = coll.snapshot()
    val q = snap.liveRows.get.select("vector").orderBy("user_id", "doc_id")
      .head().getSeq[Double](0)
    val viaTarget = snap.search(q, SearchParams(topK = 5, targetRecall = Some(t)))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    val viaExplicit = snap.search(q, SearchParams(topK = 5,
      numExploredCentroids = Some(resolved), centroidDistanceRatio = 1e18))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(viaTarget === viaExplicit)
    // explicit nprobe beats the target when both are set
    val viaBoth = snap.search(q, SearchParams(topK = 5,
      numExploredCentroids = Some(Int.MaxValue), centroidDistanceRatio = 1e18,
      targetRecall = Some(0.1)))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val viaExhaustive = snap.search(q, SearchParams(topK = 5,
      numExploredCentroids = Some(Int.MaxValue), centroidDistanceRatio = 1e18))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(viaBoth === viaExhaustive)
    // an unflushed tail doc is brute-forced by every search: calibration
    // must count it found at ANY depth (rank-0 path) — recalibrate with
    // a tail present and the curve may only move up at depth 1
    val c1 = curve.head._2
    coll.insert(Seq((0L, 9999L, Seq(100.0, 100.0, 100.0, 100.0, 100.0, 100.0)))
      .toDF("user_id", "doc_id", "vector"))
    val curve2 = coll.calibrateRecall(k = 5, nQueries = 8, ladder = Seq(1, 16))
    assert(curve2.last._2 === 1.0)
    assert(curve2.head._2 >= c1 - 1e-9 - (1.0 / (8 * 5)),
      "tail handling must not crater shallow-depth recall")
    // missing calibration fails loudly
    val coll2 = Collection.create(spark,
      Files.createTempDirectory("graft_cal2").toString,
      CollectionConfig(name = "c2", numFeatures = 6, initialNumCentroids = 4))
    coll2.insert(Seq((0L, 1L, Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("user_id", "doc_id", "vector"))
    coll2.flush()
    val e = intercept[IllegalArgumentException] {
      coll2.snapshot().search(Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
        SearchParams(topK = 1, targetRecall = Some(0.9)))
    }
    assert(e.getMessage.contains("calibrateRecall"))
  }

  test("multi-user corpus with colliding doc_ids: curve keys on (user_id, doc_id)") {
    // round-15 ADVICE (medium): truth/ranks keyed on doc_id alone let
    // ANOTHER user's same-id point supply the min centroid rank and
    // pollute truth — the curve overestimated and targetRecall
    // under-delivered. Two users REUSE doc_ids 0..159 with different
    // cluster assignments; the analytic curve must still equal real
    // unpruned search recall (computed on full (user_id, doc_id) pairs)
    // at every depth.
    val base = Files.createTempDirectory("graft_cal_mu").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "cal", numFeatures = 6, initialNumCentroids = 16))
    val r = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(6)(r.nextGaussian() * 8.0))
    val rows = (0 until 160).flatMap { i =>
      val c0 = centers(i % 8)            // user 0: cluster i%8
      val c1 = centers((i + 3) % 8)      // user 1: SAME doc_id, different cluster
      Seq((0L, i.toLong, c0.map(_ + r.nextGaussian() * 1.5).toSeq),
          (1L, i.toLong, c1.map(_ + r.nextGaussian() * 1.5).toSeq))
    }
    coll.insert(rows.toDF("user_id", "doc_id", "vector"))
    coll.flush()
    val k = 5; val nQ = 8
    val ladder = Seq(1, 2, 4, 16)
    val curve = coll.calibrateRecall(k = k, nQueries = nQ, ladder = ladder).toMap
    val snap = coll.snapshot()
    val sample = snap.liveRows.get.select("vector")
      .orderBy("user_id", "doc_id").limit(nQ)
      .collect().map(_.getSeq[Double](0))
    val exhaustive = SearchParams(topK = k,
      numExploredCentroids = Some(Int.MaxValue), centroidDistanceRatio = 1e18)
    for (p <- ladder) {
      val real = sample.map { v =>
        def pairs(params: SearchParams) =
          snap.search(v, params).select("user_id", "doc_id").collect()
            .map(row => (row.getLong(0), row.getLong(1))).toSet
        val truth = pairs(exhaustive)
        val got = pairs(SearchParams(topK = k,
          numExploredCentroids = Some(p), centroidDistanceRatio = 1e18))
        truth.intersect(got).size.toDouble / truth.size
      }
      val realRecall = real.sum / real.length
      assert(math.abs(realRecall - curve(p)) < 1e-9,
        s"nprobe=$p multi-user: analytic ${curve(p)} vs real $realRecall")
    }
  }

  test("stale calibration refused loudly; k mismatch refused; acceptStale + recalibrate resolve") {
    val (coll, _) = build()
    coll.calibrateRecall(k = 5, nQueries = 8, ladder = Seq(1, 2, 4, 8, 16))
    val snap = coll.snapshot()
    val q = snap.liveRows.get.select("vector").orderBy("user_id", "doc_id")
      .head().getSeq[Double](0)
    // fresh: resolves
    assert(snap.search(q, SearchParams(topK = 5, targetRecall = Some(0.9)))
      .count() === 5L)
    // k mismatch: curve measures recall@5, search asks topK=3 — loud
    val ek = intercept[IllegalArgumentException] {
      snap.search(q, SearchParams(topK = 3, targetRecall = Some(0.9)))
    }
    assert(ek.getMessage.contains("recall@5") && ek.getMessage.contains("topK=3"))
    // flush a new segment: the curve no longer describes the index
    coll.insert(Seq((0L, 9000L, Seq(60.0, 60.0, 60.0, 60.0, 60.0, 60.0)))
      .toDF("user_id", "doc_id", "vector"))
    coll.flush()
    val snap2 = coll.snapshot()
    val es = intercept[IllegalArgumentException] {
      snap2.search(q, SearchParams(topK = 5, targetRecall = Some(0.9)))
    }
    assert(es.getMessage.contains("stale calibration"))
    // best-effort escape hatch
    assert(snap2.search(q, SearchParams(topK = 5, targetRecall = Some(0.9),
      acceptStaleCalibration = true)).count() === 5L)
    // recalibration over the new segment set resolves again
    coll.calibrateRecall(k = 5, nQueries = 8, ladder = Seq(1, 2, 4, 8, 16))
    assert(coll.snapshot().search(q, SearchParams(topK = 5,
      targetRecall = Some(0.9))).count() === 5L)
  }

  test("maybeCompact auto-recalibrates a calibrated collection after changing the segment set") {
    val base = Files.createTempDirectory("graft_cal_mc").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "cal", numFeatures = 6, initialNumCentroids = 8,
      maxNumberOfSegments = 2))
    val r = new scala.util.Random(5)
    def batch(off: Int) = (0 until 80).map(i =>
      (0L, (off + i).toLong, Seq.fill(6)(r.nextGaussian() * 4.0)))
    coll.insert(batch(0).toDF("user_id", "doc_id", "vector")); coll.flush()
    coll.calibrateRecall(k = 5, nQueries = 4, ladder = Seq(1, 2, 4, 8))
    // two more flushes push past maxNumberOfSegments=2
    coll.insert(batch(1000).toDF("user_id", "doc_id", "vector")); coll.flush()
    coll.insert(batch(2000).toDF("user_id", "doc_id", "vector")); coll.flush()
    assert(coll.maybeCompact().exists(_.startsWith("merged")))
    // the curve was re-measured over the POST-compaction segment set:
    // a targetRecall search resolves with no staleness refusal
    val snap = coll.snapshot()
    val q = snap.liveRows.get.select("vector").orderBy("user_id", "doc_id")
      .head().getSeq[Double](0)
    assert(snap.search(q, SearchParams(topK = 5, targetRecall = Some(0.5)))
      .count() === 5L)
    val body = Files.readString(Paths.get(s"$base/cal/CALIBRATION"))
    assert(body.contains(s"segs=${coll.toc.segments.mkString(",")}"))
  }
}
