package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{Collection, CollectionConfig}
import graft.operators.CdcMirror
import graft.streaming.{CdcFollower, StreamingIngest}

/** CDC follower soak under a LIVE producer + expiry churn (round-13
  * verdict #5; BASELINE.md): StreamingSpec proves the follower loop
  * converges at toy scale — this drives it at N×768 while
  *
  *   - [[StreamingIngest]] auto-flushes streamed insert batches (plus
  *     manual deletes riding each flush),
  *   - [[Collection.expireVersions]](keep = 2) churns history after
  *     every follow (the follower's seen-version must stay inside the
  *     retention window by construction: follow-then-expire),
  *   - [[CdcFollower.followOnce]] tails the committed versions into the
  *     bucketed [[CdcMirror]].
  *
  * After EVERY follow the mirror is diffed against the collection's own
  * `liveRows` (both directions, keys + a vector hash): the soak's claim
  * is zero divergences across all rounds, with per-follow cost tracking
  * the delta (flat-ish in corpus size at fixed delta — the bucketed
  * apply rewrites touched buckets only, and the fetch is O(delta) by
  * plan shape).
  *
  * Delta sizing matters for what the soak demonstrates: k uniform keys
  * touch ~numBuckets·(1-(1-1/numBuckets)^k) buckets, so a delta of the
  * same order as numBuckets rewrites the WHOLE mirror (the first run of
  * this harness did exactly that at 3000 keys / 512 buckets and read as
  * a linear-growth red flag). Defaults model the 100 TB regime instead:
  * the delta touches a small fraction of buckets (300 keys / 2048
  * buckets ≈ 14% touched), and `maxNumberOfSegments` keeps the
  * auto-compactor churning so segment count (and with it per-follow
  * job count) plateaus instead of growing per round — compactions also
  * exercise the merge-silent CDC path under the follower.
  *
  * `runMain graft.ScaleFollow [N] [rounds] [deltaIns] [deltaDel]` —
  * defaults 200000, 6, 200, 100 (fits the 8g forked-JVM envelope).
  */
object ScaleFollow {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val rounds = if (args.length > 1) args(1).toInt else 6
    val nIns = if (args.length > 2) args(2).toLong else 200L
    val nDel = if (args.length > 3) args(3).toLong else 100L
    val dim = 768
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // wide 768-dim payload: small row groups keep 32 concurrent writers
    // inside the single-JVM envelope (same rationale as ScaleCdc)
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 32 << 20)

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[follow] $label%-32s $s%.2f s"); (r, s)
    }

    def vecFor(id: Long): Seq[Double] = {
      val c = (id % 64).toInt
      Seq.tabulate(dim) { d =>
        val base = if (d % 64 == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(id * 131071L + d)
        base + (h.toDouble / Long.MaxValue.toDouble)
      }
    }
    val genUdf = udf { (id: Long) => vecFor(id).toArray }

    val base = "/tmp/scale_follow"
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete()
    }
    deleteRec(new java.io.File(base))
    new java.io.File(base).mkdirs()
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "fsoak", numFeatures = dim,
      initialNumCentroids = math.max(16, (n / 700L).toInt),
      maxClustersPerVector = 2,
      maxPendingOps = nIns, // each streamed round triggers an auto-flush
      maxNumberOfSegments = 4)) // keep the auto-compactor churning

    val corpus = spark.range(n).select(
      lit(0L).as("user_id"), col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))
    time(s"corpus insert ($n)")(coll.insert(corpus))
    time("corpus flush -> v1")(coll.flush())

    val mirror = s"$base/mirror"
    val numBuckets = 2048
    val (_, tSeed) = time(s"follower seed ($numBuckets buckets)") {
      CdcFollower.seed(coll, mirror, numBuckets)
    }
    var seen = coll.versions.last

    /** Buckets rewritten by the latest apply = manifest entries mapped to
      * the newest generation (the manifest is line-oriented text). */
    def touchedBuckets(): (Int, Int) = {
      val lines = java.nio.file.Files.readString(
        java.nio.file.Paths.get(mirror, "MANIFEST")).split("\n").filter(_.nonEmpty)
      val gen = lines.head.stripPrefix("gen=").toLong
      val entries = lines.tail.map(_.split("=", 2)(1).toLong)
      (entries.count(_ == gen), entries.length)
    }

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Long, Seq[Double])]
    val rows = stream.toDF().toDF("user_id", "doc_id", "vector")
    val q = StreamingIngest.start(rows, coll, s"$base/cp",
      Trigger.ProcessingTime("100 milliseconds"))

    /** Both-direction diff of mirror vs the collection's live rows on
      * (user_id, doc_id, hash(vector)) — 0 means converged. */
    def divergence(): Long = {
      def keyed(df: org.apache.spark.sql.DataFrame) =
        df.select(col("user_id"), col("doc_id"), hash(col("vector")).as("h"))
      val m = keyed(CdcMirror.read(spark, mirror))
      val l = keyed(coll.snapshot().liveRows.get
        .select("user_id", "doc_id", "vector"))
      m.exceptAll(l).count() + l.exceptAll(m).count()
    }

    val followTimes = scala.collection.mutable.ArrayBuffer[Double]()
    var divergences = 0L
    try {
      var nextId = n
      (1 to rounds).foreach { r =>
        // manual deletes ride the next auto-flush alongside the streamed
        // inserts — the delta is a mixed insert+delete batch
        val delKeys = spark.range(nDel).select(lit(0L).as("user_id"),
          ((col("id") * 37L + r * 101L) % lit(nextId)).as("doc_id"))
          .dropDuplicates("user_id", "doc_id")
        coll.delete(delKeys)
        stream.addData((nextId until nextId + nIns).map(id => (0L, id, vecFor(id))))
        nextId += nIns
        q.processAllAvailable()
        if (coll.versions.last == seen) { // stream split below the flush bar
          coll.flush()
        }
        val vNow = coll.versions.last
        val (newSeen, tFollow) = time(f"round $r follow ($seen -> $vNow)") {
          CdcFollower.followOnce(coll, mirror, seen)
        }
        seen = newSeen
        followTimes += tFollow
        val (tb, nb) = touchedBuckets()
        println(s"[follow] round $r rewrote $tb of $nb live buckets")
        val d = divergence()
        if (d != 0) { divergences += d; println(s"[follow] round $r DIVERGED: $d rows") }
        // expiry AFTER the follow: the follower's seen-version is always
        // the newest at expiry time, so keep=2 never yanks it
        coll.expireVersions(keep = 2)
      }
    } finally q.stop()

    println(f"[follow] seed $tSeed%.2f s; follows ${followTimes.map(t => f"$t%.2f").mkString(", ")} s")
    println(s"[follow] divergences=$divergences (want 0) over $rounds rounds at n=$n delta=+$nIns/-$nDel")
    require(divergences == 0L, s"mirror diverged: $divergences rows")
    spark.stop()
  }
}
