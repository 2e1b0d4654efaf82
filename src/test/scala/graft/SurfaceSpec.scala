package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{AttrField, Collection, CollectionConfig, Ids}
import graft.functions.GraftFunctions._
import graft.functions.PackKernels
import graft.operators.{DocFilter, Search, SearchParams, Sessionize}

/** Remaining reference-surface pieces: u128 id shim, packed ingest (S2),
  * bloom delete short-circuit (F9), auto-compaction (M3), scatter-gather
  * (A6/D2), sessionization. */
class SurfaceSpec extends SparkSuite {
  import spark.implicits._

  test("u128 ids: uuid <-> binary <-> hi/lo round trips, order-preserving") {
    val df = Seq(
      ("00000000-0000-0000-0000-000000000064", 0L, 100L),
      ("ffffffff-ffff-ffff-ffff-ffffffffffff", -1L, -1L),
      ("00000000-0000-0001-0000-000000000000", 1L, 0L)
    ).toDF("uuid", "hi", "lo")
    val rt = df.select(
      col("uuid"),
      Ids.toUuid(Ids.fromUuid(col("uuid"))).as("rt_uuid"),
      Ids.toUuid(Ids.fromHiLo(col("hi"), col("lo"))).as("from_hilo"))
    rt.collect().foreach { r =>
      assert(r.getString(1) === r.getString(0))
      assert(r.getString(2) === r.getString(0))
    }
    // lexicographic order on the binary == unsigned u128 order
    val bins = df.select(Ids.fromUuid(col("uuid")).as("b")).orderBy("b")
      .select(Ids.toUuid(col("b"))).collect().map(_.getString(0)).toSeq
    assert(bins === Seq(
      "00000000-0000-0000-0000-000000000064",
      "00000000-0000-0001-0000-000000000000",
      "ffffffff-ffff-ffff-ffff-ffffffffffff"))
    // long fast path embeds at the low 64 bits
    val l = Seq(100L).toDF("id").select(Ids.toUuid(Ids.fromLong(col("id")))).head().getString(0)
    assert(l === "00000000-0000-0000-0000-000000000064")
    // hi/lo extraction round-trips (unsigned decimal semantics)
    val hilo = df.select(
      Ids.toHi(Ids.fromHiLo(col("hi"), col("lo"))).cast("string"),
      Ids.toLo(Ids.fromHiLo(col("hi"), col("lo"))).cast("string")).collect()
    assert(hilo(0).getString(0) === "0" && hilo(0).getString(1) === "100")
    assert(hilo(1).getString(0) === "18446744073709551615") // unsigned -1
    assert(hilo(2).getString(0) === "1" && hilo(2).getString(1) === "0")
  }

  test("packed f32 ingest (S2): pack -> unpack_f32_le round trip in codegen") {
    val vecs = Seq(Seq(1.5f, -2.25f, 3.75f), Seq(0.0f, Float.MinPositiveValue, 1e30f))
    val packed = vecs.map(v => Tuple1(PackKernels.packF32Le(v.toArray))).toDF("bin")
    val got = packed.select(unpack_f32_le(col("bin"))).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    assert(got === vecs)
    // u8 decode (quantizer code tables -> SQL-replayable int arrays)
    val bytes = Seq(Tuple1(Array[Byte](0, 127, -128, -1))).toDF("bin")
    assert(bytes.select(graft.functions.GraftFunctions.unpack_u8(col("bin")))
      .head().getSeq[Int](0) === Seq(0, 127, 128, 255))
    // column-side encode (pack_f32_le expression) inverts in codegen,
    // including the concatenated multi-vector request layout (q94)
    val arrs = vecs.map(Tuple1(_)).toDF("arr")
    val rt = arrs.select(unpack_f32_le(
      graft.functions.GraftFunctions.pack_f32_le(col("arr")))).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    assert(rt === vecs)
    val blob = arrs.agg(aggregate(sort_array(collect_list(col("arr"))),
      lit(Array.emptyByteArray),
      (acc, x) => concat(acc, graft.functions.GraftFunctions.pack_f32_le(x))))
      .head().getAs[Array[Byte]](0)
    assert(PackKernels.unpackF32Le(blob).toSeq ===
      vecs.sortBy(_.head).flatten)
  }

  test("bloom short-circuit: deletes for absent docs are dropped; present docs survive") {
    val base = Files.createTempDirectory("graft_bloom").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "b1", numFeatures = 4, initialNumCentroids = 4))
    coll.insert((0 until 100).map(i =>
      (0L, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble)))
      .toDF("user_id", "doc_id", "vector"))
    coll.flush()
    // doc 5 exists, doc 100000 does not
    coll.delete(Seq((0L, 5L), (0L, 100000L)).toDF("user_id", "doc_id"))
    val tombs = coll.tombstones.get.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(tombs === Seq(5L)) // absent pair dropped by the bloom check
  }

  test("auto-compaction merges when over maxNumberOfSegments") {
    val base = Files.createTempDirectory("graft_m3").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "m1", numFeatures = 4, initialNumCentroids = 2, maxNumberOfSegments = 2))
    (0 until 3).foreach { b =>
      coll.insert((0 until 30).map(i =>
        (0L, (b * 30 + i).toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble)))
        .toDF("user_id", "doc_id", "vector"))
      coll.flush()
    }
    assert(coll.toc.segments.size === 3)
    assert(coll.maybeCompact().isDefined)
    // SIZE-TIERED: one tick merges just enough of the smallest segments
    // to return to the cap (merge-all would rewrite the corpus every
    // tick at scale) — 3 segments over cap 2 -> merge the 2 smallest
    assert(coll.toc.segments.size === 2)
    assert(coll.maybeCompact().isEmpty) // at the cap, no tombstones
    // all 90 docs still searchable after the merge
    def live(): Long = coll.snapshot().search(Seq(0.0, 0.0, 0.0, 0.0),
      SearchParams(topK = 1000, numExploredCentroids = Some(100),
        centroidDistanceRatio = 1e9)).count()
    assert(live() === 90L)

    // auto-vacuum: tombstones >10% of the merged segment trigger a rewrite
    coll.delete((0 until 20).map(i => (0L, i.toLong)).toDF("user_id", "doc_id"))
    val action = coll.maybeCompact()
    assert(action.exists(_.startsWith("vacuumed")))
    assert(live() === 70L)
  }

  test("user-bucket partition pruning: per-user search scans a pruned table") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "p1", numFeatures = 4, initialNumCentroids = 4, userBuckets = 8))
    coll.insert((0 until 200).map { i =>
      ((i % 5).toLong, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
    }.toDF("user_id", "doc_id", "vector"))
    coll.flush()
    // physically partitioned layout on disk
    val segDir = new java.io.File(s"${coll.path}/segments/seg_1/vectors")
    assert(segDir.listFiles().exists(_.getName.startsWith("user_bucket=")))
    // per-user query: correct results through the pruned scan
    val got = coll.snapshot().search(Seq(7.0, 7.0, 7.0, 7.0),
      SearchParams(topK = 3, numExploredCentroids = Some(4), centroidDistanceRatio = 1e9),
      userIds = Seq(2L))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("user_bucket"), "expected a partition filter on user_bucket")
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(7L, 2L, 12L)) // user 2 docs: 2,7,12,... nearest to 7
  }

  test("term index is term-bucket partitioned and term search prunes to one bucket") {
    val base = java.nio.file.Files.createTempDirectory("graft_tb").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "tb1", numFeatures = 4, initialNumCentroids = 4,
      attributeSchema = Seq(AttrField("content", "text", "english"))))
    coll.insert((0 until 100).map { i =>
      val content = if (i == 7) "zebra crossing ahead" else s"document number $i"
      (0L, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble), content)
    }.toDF("user_id", "doc_id", "vector", "content"))
    coll.flush()
    // physically partitioned layout on disk
    val termDir = new java.io.File(s"${coll.path}/segments/seg_1/terms")
    assert(termDir.listFiles().exists(_.getName.startsWith("term_bucket=")))
    // term search: correct result through the bucket-pruned scan
    val got = coll.snapshot().termSearch(
      DocFilter.Contains("content", "zebra"), limit = 10)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("term_bucket"), "expected a partition filter on term_bucket")
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("scatter-gather: global top-k across shard results, ascending") {
    val s1 = Seq((0L, 1L, 3.0), (0L, 2L, 1.0)).toDF("user_id", "doc_id", "score")
    val s2 = Seq((0L, 3L, 2.0), (0L, 4L, 0.5)).toDF("user_id", "doc_id", "score")
    val got = Search.scatterGather(Seq(s1, s2), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(4L, 2L, 3L))
  }

  test("batch sessionization: gap splits sessions deterministically") {
    val us = (m: Long) => m * 60L * 1000000L
    val ev = Seq(
      (1L, 1L, us(0)), (1L, 2L, us(10)), (1L, 3L, us(50)), // gap 40 > 30 -> split
      (2L, 4L, us(5))
    ).toDF("user_id", "event_id", "us")
    val got = Sessionize.batch(ev, gapMinutes = 30)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("funnel: strict ordering, out-of-order stages don't convert, skipped stages stop") {
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full funnel
      (2L, "click", 5L), (2L, "view", 10L),                         // click precedes view
      (3L, "view", 10L), (3L, "click", 10L),                        // same ts: not strictly after
      (4L, "purchase", 1L), (4L, "view", 2L), (4L, "click", 3L),    // purchase too early
      (5L, "error", 7L)                                             // no funnel stages at all
    ).toDF("user_id", "event_type", "us")
    val got = Sessionize.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 0L)))
  }

  test("retention: first-day cohorts, same-day dedup, hand-computed matrix") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"), (1L, "2024-01-04 23:00:00"),
      (2L, "2024-01-02 08:00:00"), (2L, "2024-01-02 20:00:00"), (2L, "2024-01-03 01:00:00"),
      (3L, "2024-01-01 00:00:00")
    ).toDF("user_id", "raw").select(col("user_id"), to_timestamp(col("raw")).as("ts"))
    val got = Sessionize.retention(ev)
      .orderBy("cohort", "day_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("activeUsers: DAU and trailing-7d smear, observed days only, hand-computed") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), // same day dedup
      (1L, "2024-01-03 09:00:00"),
      (2L, "2024-01-01 08:00:00"),
      (3L, "2024-01-09 01:00:00")
    ).toDF("user_id", "raw").select(col("user_id"), to_timestamp(col("raw")).as("ts"))
    val got = Sessionize.activeUsers(ev, windowDays = 7)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    // d9's trailing window [01-03..01-09] holds u1 (active 01-03) and u3
    assert(got === Seq(
      ("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 2L), ("2024-01-09", 1L, 2L)))
  }

  test("asofJoin: most-recent-prior match, equal-ts inclusion, no-match null, per-key isolation") {
    import graft.operators.AsofJoin
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 20L), (3L, 100L, 5L), // user 100 at t=10,20,5
      (4L, 200L, 50L) // user 200: no right rows at all
    ).toDF("event_id", "user_id", "us")
    val right = Seq(
      (100L, 10L, 1.5), (100L, 15L, 2.5), // user 100 views at t=10,15
      (300L, 1L, 9.9) // other user's rows must not leak
    ).toDF("user_id", "vus", "view_value")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "us", "vus",
      Seq("view_value"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      (1L, Some(1.5)),  // equal ts: right row AT t=10 matches (<=)
      (2L, Some(2.5)),  // most recent prior, not first
      (3L, None),       // t=5 precedes every right row
      (4L, None)))      // user with no right rows
    // multi-partition: same result under a different partitioning
    val got2 = AsofJoin.asofJoin(left.repartition(5), right.repartition(3),
      Seq("user_id"), "us", "vus", Seq("view_value"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got2.toSeq === got.toSeq)
    // equal-ts ties on the right resolve deterministically to the
    // greatest value tuple
    val tied = right.union(Seq((100L, 15L, 2.0)).toDF("user_id", "vus", "view_value"))
    val t = AsofJoin.asofJoin(left, tied, Seq("user_id"), "us", "vus",
      Seq("view_value"))
      .filter(col("event_id") === 2L).collect().head.getDouble(3)
    assert(t === 2.5)
  }

  test("range join: boundary inclusion, multi-bucket spans, overlap, key isolation") {
    import graft.operators.RangeJoin
    val points = Seq(
      (1L, 7L, 10L), (2L, 7L, 25L), (3L, 7L, 31L), (4L, 7L, 99L), // key 7
      (5L, 8L, 10L) // other key: interval [5,30] of key 7 must not leak
    ).toDF("event_id", "user_id", "us")
    val intervals = Seq(
      (7L, 1L, 10L, 30L),  // contains pts 10 (lo boundary), 25; spans buckets 1-3
      (7L, 2L, 25L, 31L),  // overlaps the first: pt 25 matches BOTH, 31 = hi boundary
      (8L, 9L, 90L, 95L)   // other key, matches nothing
    ).toDF("user_id", "iv", "lo", "hi")
    val got = RangeJoin.bucketed(points, intervals, Seq("user_id"),
      "us", "lo", "hi", bucketWidth = 10L)
      .select("event_id", "iv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L)))
    // partitioning invariance
    val got2 = RangeJoin.bucketed(points.repartition(4), intervals.repartition(3),
      Seq("user_id"), "us", "lo", "hi", bucketWidth = 10L)
      .select("event_id", "iv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === got)
    // bucket width far larger than spans still exact
    val got3 = RangeJoin.bucketed(points, intervals, Seq("user_id"),
      "us", "lo", "hi", bucketWidth = 1000L)
      .select("event_id", "iv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 === got)
  }

  test("batch sessionization: distributed scan matches a driver scan on one giant user") {
    // one user whose timeline spans every range partition, with irregular
    // gaps, plus a small user to exercise the non-spanning path
    val gapUs = 30L * 60L * 1000000L
    val times = (0 until 4000).scanLeft(0L) { (t, i) =>
      t + (if (i % 97 == 96) gapUs + 1L else 1000000L * (1 + i % 5))
    }
    val ev = (times.zipWithIndex.map { case (t, i) => (7L, i.toLong, t) } :+
      ((8L, 99999L, 0L))).toDF("user_id", "event_id", "us")
    val got = Sessionize.batch(ev, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // reference scan on the driver
    var idx = 0L
    var prev = Option.empty[Long]
    val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var (n, start, end) = (0L, 0L, 0L)
    times.foreach { t =>
      if (prev.isEmpty || t - prev.get > gapUs) {
        if (n > 0) sessions += ((7L, idx, n, start, end))
        idx += 1; n = 0; start = t
      }
      n += 1; end = t; prev = Some(t)
    }
    sessions += ((7L, idx, n, start, end))
    sessions += ((8L, 1L, 1L, 0L, 0L))
    assert(got === sessions.toSet)
  }

  test("streaming sessionization closes sessions on gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Sessionize.SessionEvent]
    val out = Sessionize.streaming(stream.toDS(), gapMinutes = 30)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      val us = (m: Long) => m * 60L * 1000000L
      stream.addData(Sessionize.SessionEvent(1L, us(0)), Sessionize.SessionEvent(1L, us(10)))
      q.processAllAvailable()
      stream.addData(Sessionize.SessionEvent(1L, us(60))) // gap 50 min -> closes first
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Sessionize.ClosedSession].collect()
      assert(closed.length === 1)
      assert(closed(0) === Sessionize.ClosedSession(1L, us(0), us(10), 2L))
    } finally q.stop()
  }
}
