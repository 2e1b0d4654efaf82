package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Collection, CollectionConfig}
import graft.operators.{Ann, IvfBuilder, SearchParams}

/** Big-k flush end-to-end (round-14 verdict #4; BASELINE.md): the pruned
  * Lloyd loop's payoff regime — k ≈ 10000 centroids at 1M × 768, where
  * ProfKmeans measured the isolated k-means at 26.8 s pruned vs 155.5 s
  * exact — had never been driven through a real `Collection.flush`. This
  * harness does the full lifecycle at that shape: insert → flush (k-means
  * dispatches to `localKMeansPruned` at k ≥ 512; posting assignment uses
  * the two-level pruned path) → search + recall@10 vs brute force, and
  * attributes the flush by re-running `IvfBuilder.buildCentroids` on the
  * same frame (same code path, separately timed) so the k-means share is
  * a measured fraction, not an inference. Expected (r13 attribution): the
  * flush is WRITE-PATH bound — k-means subdominant.
  *
  * `runMain graft.ScaleBigK [n] [k] [probeGroups] [nQueries]` — defaults
  * 1000000, 10000, 8, 10.
  */
object ScaleBigK {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val k = if (args.length > 1) args(1).toInt else 10000
    val probeGroups = if (args.length > 2) args(2).toInt else 8
    val nq = if (args.length > 3) args(3).toInt else 10
    val dim = 768
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bigk] $label%-40s $s%.1f s"); (r, s)
    }

    // the Scale/ScaleTenants synthetic shape: 64 planted directions so
    // recall is meaningful, hash-mixed noise so nothing is degenerate
    val genUdf = udf { (id: Long) =>
      val c = (id % 64).toInt
      Array.tabulate(dim) { d =>
        val base = if (d % 64 == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(id * 131071L + d)
        base + (h.toDouble / Long.MaxValue.toDouble)
      }
    }
    def queryFor(id: Long): Seq[Double] = {
      val c = (id % 64).toInt
      Seq.tabulate(dim) { d =>
        val base = if (d % 64 == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(id * 131071L + d)
        base + (h.toDouble / Long.MaxValue.toDouble) + 0.01
      }
    }

    val base = "/tmp/scale_bigk"
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete()
    }
    deleteRec(new java.io.File(base))
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "bigk", numFeatures = dim,
      initialNumCentroids = k, maxClustersPerVector = 1,
      assignProbeGroups = probeGroups))

    val rows = spark.range(n).select(
      lit(0L).as("user_id"), col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))
    val (_, insertSec) = time(s"insert ($n x $dim)")(coll.insert(rows))
    val (_, flushSec) = time(s"flush (k=$k, probeGroups=$probeGroups)")(coll.flush())

    // k-means attribution: the same buildCentroids call the flush just
    // made, on the same persisted tail-shaped input (segment vectors),
    // separately timed — upper-bounds the k-means share of the flush
    // (includes its sampling scan)
    val segVecs = spark.read.parquet(s"$base/bigk/segments/seg_1/vectors")
      .select(col("user_id"), col("point_id"), col("vector"))
    val params = IvfBuilder.BuildParams(numCentroids = k,
      maxClustersPerVector = 1, assignProbeGroups = probeGroups)
    val (cents, centroidSec) = time(s"buildCentroids re-run (attribution)")(
      IvfBuilder.buildCentroids(segVecs, params))
    val builtK = cents.count()

    // search + recall at the big-k probe posture
    val nprobe = math.max(8, k / 100)
    val snap = coll.snapshot()
    val sp = SearchParams(topK = 10, numExploredCentroids = Some(nprobe))
    snap.search(queryFor(1L), sp).collect() // warm codegen/footers
    val emb = spark.read.parquet(s"$base/bigk/segments/seg_1/vectors")
      .select(col("doc_id").as("vec_id"), col("vector").cast("array<double>").as("embedding"))
    var searchTot = 0.0
    val recalls = (0 until nq).map { i =>
      val qid = i.toLong * (n / nq)
      val q = queryFor(qid)
      val t0 = System.nanoTime()
      val got = snap.search(q, sp).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      searchTot += (System.nanoTime() - t0) / 1e9
      val truth = Ann.bruteForceTopK(emb, q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      truth.intersect(got).size / 10.0
    }
    val recall = recalls.sum / recalls.length

    println(s"""{"op":"bigk","n":$n,"dim":$dim,"k":$k,"built_k":$builtK,""" +
      s""""probe_groups":$probeGroups,"insert_sec":${f"$insertSec%.1f"},""" +
      s""""flush_sec":${f"$flushSec%.1f"},"centroid_sec":${f"$centroidSec%.1f"},""" +
      s""""kmeans_frac":${f"${centroidSec / flushSec}%.3f"},""" +
      s""""search_mean_sec":${f"${searchTot / nq}%.3f"},"nprobe":$nprobe,""" +
      s""""recall_at10":${f"$recall%.3f"}}""")
    spark.stop()
  }
}
