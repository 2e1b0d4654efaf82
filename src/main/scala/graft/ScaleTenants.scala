package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Collection, CollectionConfig}
import graft.operators.SearchParams

/** Multi-tenant scale harness (round-11 verdict #5; BASELINE.md): the
  * reference's reason to exist is thousands of per-user indexes
  * (rs/index/src/multi_spann/index.rs keeps a per-user map and opens only
  * the NAMED users' indexes). graft's form of that isolation is F11:
  * segment vector tables are physically partitioned into user-hash bucket
  * directories, and a per-tenant search filters on the `user_bucket`
  * partition column, so Catalyst prunes to 1/userBuckets of the corpus
  * before the scan regardless of tenant count.
  *
  * This harness builds U tenants x rowsPerUser vectors (defaults 10000 x
  * 100 = 1M rows, 768-dim, 64 buckets), ASSERTS the pruned plan (the
  * executed plan must carry a PartitionFilters entry on user_bucket —
  * same check as SurfaceSpec's F11 assert, here at scale), then measures:
  * per-tenant Spark search latency (median over sampled tenants), a
  * 10-tenant batched search, the same query WITHOUT pruning for contrast,
  * and the in-memory serving path (`serveUser` build + query — the
  * reference's resident per-user index shape).
  *
  * `runMain graft.ScaleTenants [users] [rowsPerUser] [buckets]` —
  * defaults 10000, 100, 64.
  */
object ScaleTenants {
  def main(args: Array[String]): Unit = {
    val users = args.headOption.map(_.toInt).getOrElse(10000)
    val perUser = if (args.length > 1) args(1).toInt else 100
    val buckets = if (args.length > 2) args(2).toInt else 64
    // 4th arg: flush-time assignment probe groups (0 = exact full scan;
    // e.g. 8 = two-level pruned assignment — the big-segment flush lever)
    val probeGroups = if (args.length > 3) args(3).toInt else 0
    val n = users.toLong * perUser
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
      println(f"[tenants] $label%-36s $s%.3f s"); (r, s)
    }

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

    val base = "/tmp/scale_tenants"
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete()
    }
    deleteRec(new java.io.File(base))
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "tenants", numFeatures = dim,
      initialNumCentroids = math.max(16, (n / 700L).toInt),
      maxClustersPerVector = 2, userBuckets = buckets,
      assignProbeGroups = probeGroups))

    val rows = spark.range(n).select(
      (col("id") / perUser).cast("long").as("user_id"),
      col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))
    time(s"insert ($users tenants x $perUser)")(coll.insert(rows))
    time("flush -> one bucketed segment")(coll.flush())

    val params = SearchParams(topK = 10, numExploredCentroids = Some(8))
    val snap = coll.snapshot()
    val sampleTenants = Seq(0L, users / 7L, users / 3L, users / 2L,
      users - 1L).map(_.max(0L)).distinct

    // ---- F11 plan assert at scale: the per-tenant search plan must
    // carry a PartitionFilters entry on user_bucket (directory pruning
    // BEFORE the scan), exactly like SurfaceSpec pins at toy size
    val probe = snap.search(queryFor(42L), params, userIds = Seq(42L % users))
    val plan = probe.queryExecution.executedPlan.toString
    require(plan.contains("PartitionFilters") && plan.contains("user_bucket"),
      "per-tenant search plan lost the user_bucket partition filter (F11)")
    probe.collect() // warm codegen + footer reads before measuring

    // ---- per-tenant Spark search latency (median over sampled tenants)
    val perTenant = sampleTenants.map { u =>
      val (rows, dt) = time(s"tenant $u search") {
        snap.search(queryFor(u * perUser), params, userIds = Seq(u)).collect()
      }
      require(rows.nonEmpty && rows.forall(_.getAs[Long]("user_id") == u),
        s"tenant $u got rows from another tenant")
      dt
    }.sorted
    val medTenant = perTenant(perTenant.length / 2)

    // ---- 10-tenant batch: one plan serving several named tenants
    val ten = (0 until 10).map(i => (i.toLong * (users / 10)).min(users - 1L))
    val (_, tBatch) = time("10-tenant batched search")(
      snap.search(queryFor(7L), params, userIds = ten).collect())

    // ---- contrast: the same search with NO bucket pruning (full-corpus
    // scan + row filter) — what every query would pay without F11
    val unpruned = Collection.open(spark, base, CollectionConfig(
      name = "tenants", numFeatures = dim,
      initialNumCentroids = math.max(16, (n / 700L).toInt),
      maxClustersPerVector = 2, userBuckets = 0))
    val snapU = unpruned.snapshot()
    snapU.search(queryFor(3L), params, userIds = Seq(3L)).collect() // warm
    val (_, tUnpruned) = time("same search, pruning disabled")(
      snapU.search(queryFor(11L * perUser), params, userIds = Seq(11L)).collect())

    // ---- serving path: resident per-user view (the reference's shape)
    val u0 = sampleTenants(1)
    val (view, tServe) = time(s"serveUser($u0) build")(coll.serveUser(u0))
    val (_, tServedQ) = time("served in-memory query x100") {
      var i = 0
      while (i < 100) { view.search(queryFor(u0 * perUser).toArray, 10, nprobe = 8); i += 1 }
    }

    println(s"""{"op":"tenants","users":$users,"rows":$n,"buckets":$buckets,"probe_groups":$probeGroups,""" +
      f""""tenant_search_median_sec":$medTenant%.3f,"batch10_sec":$tBatch%.3f,""" +
      f""""unpruned_sec":$tUnpruned%.3f,"serve_build_sec":$tServe%.3f,""" +
      f""""served_query_us":${tServedQ * 1e6 / 100}%.1f,"plan_pruned":true}""")
    spark.stop()
    // successful runs leave nothing behind (stale multi-GB harness dirs
    // have filled the sandbox disk); failures keep theirs for debugging
    deleteRec(new java.io.File(base))
  }
}
