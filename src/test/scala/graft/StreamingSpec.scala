package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{AttrField, Collection, CollectionConfig}
import graft.operators.SearchParams
import graft.streaming.{StreamingDedup, StreamingIngest, StreamingNearDup}

/** Streaming ingest: WAL-ish micro-batches, auto-flush policy,
  * read-your-writes (SURVEY §2.9 R1-R7). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("memory stream -> ingest -> auto-flush at maxPendingOps -> search") {
    val base = Files.createTempDirectory("graft_stream").toString
    val cp = Files.createTempDirectory("graft_cp").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "s1", numFeatures = 4, initialNumCentroids = 4,
      maxPendingOps = 100L,
      attributeSchema = Seq(AttrField("content", "text", "english"))))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Seq[Double], String)]
    val rows = stream.toDF().toDF("user_id", "doc_id", "vector", "content")
    val q = StreamingIngest.start(rows, coll, cp, Trigger.ProcessingTime("100 milliseconds"))
    try {
      def batch(from: Int, until: Int) = (from until until).map { i =>
        (0L, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble), s"doc number $i")
      }
      stream.addData(batch(0, 80))
      q.processAllAvailable()
      // 80 < maxPendingOps: nothing flushed, but read-your-writes serves it
      assert(coll.toc.segments.isEmpty)
      val pre = coll.snapshot().search(Seq(2.4, 3.4, 4.4, 5.4), SearchParams(topK = 2))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(pre === Seq(4L, 3L))

      stream.addData(batch(80, 160))
      q.processAllAvailable()
      // 160 >= 100: auto-flush built a segment
      assert(coll.toc.segments.size === 1)
      val post = coll.snapshot().search(Seq(150.0, 150.0, 150.0, 150.0),
        SearchParams(topK = 2, numExploredCentroids = Some(4)))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(post === Seq(150L, 149L))
    } finally q.stop()
  }

  test("epoch replay is idempotent: retried batch overwrites its own ops dir") {
    val base = Files.createTempDirectory("graft_epoch").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "e1", numFeatures = 4, initialNumCentroids = 4))
    val rows = (0 until 10).map { i =>
      (0L, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
    }.toDF("user_id", "doc_id", "vector")
    // simulate a foreachBatch retry of the same epoch after a crash
    coll.insertAt(0L, rows)
    coll.insertAt(0L, rows)
    val tail = coll.snapshot().search(Seq(0.0, 0.0, 0.0, 0.0), SearchParams(topK = 100))
    assert(tail.count() === 10L, "retried epoch must not duplicate rows")
  }

  test("file-source streaming over the driver's events table -> windowed agg matches batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Files.createTempDirectory("graft_events_src")
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val schema = spark.read.parquet(src.toString).schema
    val stream = graft.sources.Events
      .normalize(spark.readStream.schema(schema).parquet(src.toString))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ev_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_out").agg(sum("cnt")).head().getLong(0)
      val batch = spark.read.parquet(src.toString).count()
      assert(streamed === batch) // every event lands in exactly one window
      assert(spark.table("ev_out").count() > 10) // real windows materialized
    } finally q.stop()
  }

  test("event-time windowed aggregation with watermark (engine capability beyond reference)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = stream.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      stream.addData(Seq((t(1), "click", 1.0), (t(2), "click", 2.0), (t(7), "view", 5.0)))
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("window.start").cast("string"), col("event_type"), col("cnt"), col("sv"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === Set(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 10:05:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming exact dedup keeps the first-seen normalized text across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamingDedup.exact(stream.toDF().toDF("id", "text"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData((1L, "alpha beta gamma"), (2L, "ALPHA  beta gamma"), (3L, "other text"))
      q.processAllAvailable()
      // normalized dup (2) dropped within the first batch
      assert(spark.table("dedup_out").select("id")
        .collect().map(_.getLong(0)).toSet === Set(1L, 3L))
      stream.addData((4L, "alpha beta gamma"), (5L, "fresh content here"))
      q.processAllAvailable()
      // cross-batch dup (4) dropped by state; fresh row kept
      assert(spark.table("dedup_out").select("id")
        .collect().map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("streaming dedup against a static corpus snapshot drops seen content") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // standing corpus: the snapshot a batch Dedup.exact run would persist
    val seen = graft.operators.Dedup.exact(
      Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")).select("content_hash")
    val stream = MemoryStream[(Long, String)]
    val out = StreamingDedup.exactWithSnapshot(
      stream.toDF().toDF("id", "text"), seen)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("snap_dedup_out").start()
    try {
      stream.addData(
        (1L, "ALPHA  beta gamma"),   // normalized dup of snapshot content
        (2L, "fresh content here"),
        (3L, "fresh  CONTENT here")) // in-stream normalized dup of 2
      q.processAllAvailable()
      assert(spark.table("snap_dedup_out").select("id")
        .collect().map(_.getLong(0)).toSet === Set(2L))
      stream.addData((4L, "alpha beta gamma"), (5L, "fresh content here"), (6L, "brand new"))
      q.processAllAvailable()
      // snapshot dup (4) and cross-batch stream dup (5) both dropped
      assert(spark.table("snap_dedup_out").select("id")
        .collect().map(_.getLong(0)).toSet === Set(2L, 6L))
    } finally q.stop()
  }

  test("streaming image near-dup: dHash sketches through the keyed-state machinery") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def bmp(seed: Long): Array[Byte] = {
      import graft.functions.HashKernels.mix64
      val im = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (by <- 0 until 8; bx <- 0 until 8) {
        val v = math.floorMod(mix64(seed * 8191L + by * 8 + bx), 256L).toInt
        for (y <- 0 until 4; x <- 0 until 4)
          im.setRGB(bx * 4 + x, by * 4 + y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "bmp", bos); bos.toByteArray
    }
    val stream = MemoryStream[(Long, Array[Byte])]
    val media = stream.toDF().toDF("media_id", "payload").withColumn("kind", lit("image"))
    val matches = StreamingNearDup.sketches(
      graft.operators.Multimodal.imageHashes(media), maxHamming = 6)
    val q = matches.writeStream.outputMode("append")
      .format("memory").queryName("img_neardup_out").start()
    try {
      stream.addData((1L, bmp(1L)), (5L, bmp(2L)))
      q.processAllAvailable()
      assert(spark.table("img_neardup_out").count() === 0L)
      stream.addData((2L, bmp(1L))) // re-encoded copy arriving a batch later
      q.processAllAvailable()
      val got = spark.table("img_neardup_out").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === Set((1L, 2L, 0)))
    } finally q.stop()
  }

  test("streaming simhash near-dup: pairs within and across batches, distinct text silent") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val matches = StreamingNearDup.simhash(stream.toDF().toDF("doc_id", "text"))
    val q = matches.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      val textA = (1 to 40).map(i => s"tok$i").mkString(" ")
      val textC = (100 to 140).map(i => s"zzz$i").mkString(" ")
      stream.addData((1L, textA), (5L, textC))
      q.processAllAvailable()
      // unrelated docs: no match events
      assert(spark.table("neardup_out").count() === 0L)
      stream.addData((2L, textA))
      q.processAllAvailable()
      // cross-batch near-dup found via keyed state (identical -> hamming 0);
      // delivery is at-least-once per shared band, so distinct the events
      val got = spark.table("neardup_out").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === Set((1L, 2L, 0)))
      // within-batch pairs too: two more copies arriving together match
      // each other AND everything in state
      stream.addData((3L, textA), (4L, textA))
      q.processAllAvailable()
      val all = spark.table("neardup_out").select("a", "b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    } finally q.stop()
  }

  test("watermarked near-dup: pre-epoch rows are a documented Spark-level drop, stream stays live") {
    // Spark's FlatMapGroupsWithStateExec filters rows with event time
    // below the watermark BEFORE the state function runs, and the initial
    // watermark is 0 — so negative-millis (pre-1970) event times never
    // reach the operator no matter what the state function does (the
    // operator's own watermark==0 sentinel handling is for the
    // eviction/late math on rows that DO arrive). The contract is:
    // pre-epoch rows silently drop, the stream keeps matching normal rows.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val old = java.sql.Timestamp.valueOf("1969-06-01 10:00:00") // negative millis
    val now = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val textA = (1 to 40).map(i => s"tok$i").mkString(" ")
    val matches = StreamingNearDup.simhash(
      stream.toDF().toDF("ts", "doc_id", "text"),
      eventTimeCol = "ts", delay = "10 minutes")
    val q = matches.writeStream.outputMode("append")
      .format("memory").queryName("neardup_preepoch_out").start()
    try {
      stream.addData((old, 1L, textA), (old, 2L, textA))
      q.processAllAvailable()
      assert(spark.table("neardup_preepoch_out").count() === 0L)
      // the stream is still healthy: post-epoch duplicates match
      stream.addData((now, 3L, textA), (now, 4L, textA))
      q.processAllAvailable()
      val got = spark.table("neardup_preepoch_out").select("a", "b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((3L, 4L)))
    } finally q.stop()
  }

  test("watermarked near-dup: idle buckets evicted past horizon, in-horizon dups still match") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val textA = (1 to 40).map(i => s"tok$i").mkString(" ")
    val textB = (100 to 140).map(i => s"yyy$i").mkString(" ")
    val textC = (200 to 240).map(i => s"zzz$i").mkString(" ")
    val matches = StreamingNearDup.simhash(
      stream.toDF().toDF("ts", "doc_id", "text"),
      eventTimeCol = "ts", delay = "10 minutes")
    val q = matches.writeStream.outputMode("append")
      .format("memory").queryName("neardup_wm_out").start()
    try {
      // doc 1 seeds its band buckets at 10:00 (timeout arms at ~10:10)
      stream.addData((ts(0), 1L, textA))
      q.processAllAvailable()
      // unrelated traffic pushes the watermark to 10:20 (> the timeout)...
      stream.addData((ts(30), 2L, textB))
      q.processAllAvailable()
      // ...and a data-less-for-that-bucket batch lets the timeout FIRE:
      // doc 1's buckets are removed (state bounded by the horizon, not
      // by every band key ever seen)
      stream.addData((ts(35), 9L, textC))
      q.processAllAvailable()
      // an identical doc arriving after the horizon finds an EMPTY bucket
      stream.addData((ts(40), 3L, textA))
      q.processAllAvailable()
      assert(spark.table("neardup_wm_out").filter("a = 1 or b = 1").count() === 0L,
        "bucket older than the horizon must be evicted")
      // but a fresh duplicate within the horizon still matches
      stream.addData((ts(41), 4L, textA))
      q.processAllAvailable()
      val got = spark.table("neardup_wm_out").select("a", "b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((3L, 4L)))
    } finally q.stop()
  }

  test("watermarked streaming dedup drops in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = StreamingDedup.exact(
      stream.toDF().toDF("ts", "text"), eventTimeCol = "ts", delay = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      stream.addData((ts(0), "first doc body"), (ts(1), "first  DOC body"))
      q.processAllAvailable()
      stream.addData((ts(5), "first doc body"), (ts(6), "second doc body"))
      q.processAllAvailable()
      // both later duplicates are within the 10-minute horizon of the
      // first-seen row -> dropped; distinct content kept
      val texts = spark.table("dedup_wm_out").select("text")
        .collect().map(_.getString(0)).toSet
      assert(texts === Set("first doc body", "second doc body"))
    } finally q.stop()
  }

  test("streaming funnel: cross-batch advancement, strict order, no-change silence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[graft.operators.Sessionize.StageEvent]
    val out = graft.operators.Sessionize.funnelStreaming(stream.toDS(), Seq("view", "click", "purchase"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      // batch 1: user 1 views; user 2 clicks (no view yet -> no advance)
      stream.addData(graft.operators.Sessionize.StageEvent(1L, "view", 10L),
        graft.operators.Sessionize.StageEvent(2L, "click", 5L))
      q.processAllAvailable()
      // batch 2: user 1 clicks+purchases in order; user 2 views (stage 1 now)
      stream.addData(graft.operators.Sessionize.StageEvent(1L, "click", 20L),
        graft.operators.Sessionize.StageEvent(1L, "purchase", 30L),
        graft.operators.Sessionize.StageEvent(2L, "view", 9L))
      q.processAllAvailable()
      // batch 3: user 2's old click (us=5 < view conv 9) CANNOT advance now
      stream.addData(graft.operators.Sessionize.StageEvent(2L, "click", 7L),
        graft.operators.Sessionize.StageEvent(3L, "error", 1L))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").as[graft.operators.Sessionize.FunnelAdvance]
        .collect().sortBy(a => (a.userId, a.completed)).toSeq
      assert(rows === Seq(
        graft.operators.Sessionize.FunnelAdvance(1L, 1L, 10L),
        graft.operators.Sessionize.FunnelAdvance(1L, 3L, 30L),
        graft.operators.Sessionize.FunnelAdvance(2L, 1L, 9L)))
    } finally q.stop()
  }

  test("a CDC follower tails changes() across streaming flushes to a converged mirror") {
    val base = Files.createTempDirectory("graft_follow").toString
    val cp = Files.createTempDirectory("graft_follow_cp").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "fw", numFeatures = 4, initialNumCentroids = 4, maxPendingOps = 50L))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Seq[Double])]
    val rows = stream.toDF().toDF("user_id", "doc_id", "vector")
    val q = StreamingIngest.start(rows, coll, cp, Trigger.ProcessingTime("100 milliseconds"))
    try {
      def batch(from: Int, until: Int) = (from until until).map { i =>
        (0L, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble))
      }
      // the follower: a key-set mirror fed ONLY by changes() between the
      // versions it has seen — the downstream-consumer loop q103 gates in
      // batch form, here driven by streaming auto-flush commits
      var mirror = Set.empty[Long]
      var seenV = coll.versions.last
      def follow(): Unit = coll.versions.last match {
        case now if now > seenV =>
          coll.changes(seenV, now).collect().foreach { r =>
            r.getString(2) match {
              case "insert" | "update" => mirror += r.getLong(1)
              case "delete" => mirror -= r.getLong(1)
            }
          }
          seenV = now
          val want = coll.snapshotAt(now).liveDocs.get
            .select("doc_id").collect().map(_.getLong(0)).toSet
          assert(mirror === want, s"mirror diverged at version $now")
        case _ => ()
      }
      stream.addData(batch(0, 60)) // > maxPendingOps -> auto-flush commits v1
      q.processAllAvailable()
      follow()
      coll.delete(Seq((0L, 10L), (0L, 11L)).toDF("user_id", "doc_id"))
      stream.addData(batch(60, 120)) // auto-flush commits v2 (with the deletes)
      q.processAllAvailable()
      follow()
      assert(seenV >= 2L, "auto-flush never committed a second version")
      assert(mirror === ((0L until 120L).toSet -- Set(10L, 11L)))
    } finally q.stop()
  }

  test("CdcFollower keeps a bucketed parquet mirror converged across streaming flushes") {
    val base = Files.createTempDirectory("graft_follow2").toString
    val cp = Files.createTempDirectory("graft_follow2_cp").toString
    val mirror = Files.createTempDirectory("graft_follow2_m").resolve("m").toString
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "fw2", numFeatures = 4, initialNumCentroids = 4, maxPendingOps = 50L))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Seq[Double])]
    val rows = stream.toDF().toDF("user_id", "doc_id", "vector")
    val q = StreamingIngest.start(rows, coll, cp, Trigger.ProcessingTime("100 milliseconds"))
    try {
      // TWO tenants with OVERLAPPING doc_ids: the mirror must key by
      // (user_id, doc_id) — a doc_id-only key would let user 0's delete
      // clobber user 1's row with the same id
      def batch(from: Int, until: Int) = (from until until).flatMap { i =>
        Seq((0L, i.toLong, Seq(i.toDouble, i.toDouble, i.toDouble, i.toDouble)),
          (1L, i.toLong, Seq(-i.toDouble, -i.toDouble, -i.toDouble, -i.toDouble)))
      }
      stream.addData(batch(0, 30)) // > maxPendingOps -> auto-flush commits v1
      q.processAllAvailable()
      var seen = graft.streaming.CdcFollower.seed(coll, mirror, numBuckets = 16)
      def mirrorIds(): Set[(Long, Long)] =
        graft.operators.CdcMirror.read(spark, mirror)
          .select("user_id", "doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def liveIds(): Set[(Long, Long)] =
        coll.snapshot().liveDocs.get.select("user_id", "doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(mirrorIds() === liveIds())
      // an idle follow is a version-level no-op: nothing committed,
      // nothing rewritten
      assert(graft.streaming.CdcFollower.followOnce(coll, mirror, seen) === seen)
      coll.delete(Seq((0L, 10L), (0L, 11L)).toDF("user_id", "doc_id"))
      stream.addData(batch(30, 60)) // auto-flush commits v2 (with the deletes)
      q.processAllAvailable()
      seen = graft.streaming.CdcFollower.followOnce(coll, mirror, seen)
      assert(seen >= 2L, "auto-flush never committed a second version")
      assert(mirrorIds() === liveIds())
      // user 0's delete of docs 10/11 must NOT touch user 1's 10/11
      assert(!mirrorIds().contains((0L, 10L)) && mirrorIds().contains((1L, 10L)))
      // the follower composes: sleep through TWO commits, catch up in one
      coll.delete(Seq((0L, 35L)).toDF("user_id", "doc_id")); coll.flush()
      stream.addData(batch(60, 90))
      q.processAllAvailable()
      seen = graft.streaming.CdcFollower.followOnce(coll, mirror, seen)
      assert(mirrorIds() === liveIds())
      // and the payloads ride along per tenant, not just the keys
      val v = graft.operators.CdcMirror.read(spark, mirror)
        .filter(col("doc_id") === 75L && col("user_id") === 1L)
        .select("vector").head().getSeq[Double](0)
      assert(v === Seq(-75.0, -75.0, -75.0, -75.0))
    } finally q.stop()
  }
}
