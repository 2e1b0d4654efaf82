package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline IVF index construction (SURVEY §2.4 A1-A3) — the Spark-native
  * rebuild of the reference's SpannBuilder path
  * (rs/index/src/ivf/builder.rs): k-means over a bounded sample, recursive
  * split of oversized clusters (builder.rs:420-459 `cluster_docs`), then
  * multi-assignment of every vector to its nearest centroid(s) within
  * `distance_threshold_pct` of the nearest (builder.rs:292-367).
  *
  * Scale posture: centroid training runs on a driver-bounded sample
  * (reference does the same — `clustering sample` 20k default,
  * rs/config/src/collection.rs:180); the full-data pass (assignment) is a
  * single map over the vectors against a broadcast centroid array —
  * no shuffle, no crossJoin blowup. Oversized-cluster splitting reclusters
  * each cluster's members inside one task via flatMapGroups, so no cluster
  * ever needs to fit on the driver.
  */
object IvfBuilder {

  final case class BuildParams(
      numCentroids: Int = 10,
      maxClustersPerVector: Int = 1,
      distanceThresholdPct: Double = 0.1,
      maxPostingListSize: Long = Long.MaxValue,
      sampleSize: Int = 20000,
      /** >0: two-level pruned assignment — scan only the member centroids
        * of this many nearest super-groups per vector (~sqrt(k)-fold
        * fewer distance evals; near-exact). 0 = exact full scan. */
      assignProbeGroups: Int = 0,
      seed: Long = 42L)

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Above this k, [[localKMeans]] switches to the two-level pruned
    * Lloyd path: exact assignment is O(n·k·d) PER ITERATION and k-means++
    * seeding is O(n·k·d) once — at the tens-of-thousands-of-centroids
    * regime a 100 TB segment needs, the driver binds on it (round-13
    * verdict #4: 19.4 s at 20k×1428×768×20, linear in k). Below the
    * threshold the original exact path runs bit-identically, so every
    * small-k gate (q30, RecallSpec, the sf0.1 lifecycle collections) is
    * unchanged. */
  private[operators] val prunedKmeansThreshold = 512

  /** Plain Lloyd k-means over an in-memory sample (driver/task local).
    * Deterministic: seeded initial centers, fixed iteration count.
    * For k ≥ [[prunedKmeansThreshold]] the assignment step is pruned
    * through ~sqrt(k) center groups (see [[localKMeansPruned]]). */
  private[operators] def localKMeans(
      points: Array[Array[Double]], k: Int, seed: Long, iters: Int = 20): Array[Array[Double]] = {
    if (points.isEmpty) return Array.empty
    if (math.min(k, points.length) >= prunedKmeansThreshold)
      localKMeansPruned(points, k, seed, iters)
    else localKMeansExact(points, k, seed, iters)
  }

  /** The original exact Lloyd path (k-means++ seeding, full assignment
    * scan) — dispatch target below [[prunedKmeansThreshold]], kept
    * callable for the ProfKmeans exact-vs-pruned A/B. */
  private[operators] def localKMeansExact(
      points: Array[Array[Double]], k: Int, seed: Long, iters: Int = 20): Array[Array[Double]] = {
    if (points.isEmpty) return Array.empty
    val kk = math.min(k, points.length)
    val rnd = new scala.util.Random(seed)
    // k-means++ seeding, deterministic, with the running-min-distance
    // formulation (O(k*n*d), not O(k^2*n*d))
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    val d2 = points.map(p => sqDist(p, centers(0)))
    var c = 1
    while (c < kk) {
      val total = d2.sum
      var pick = if (total > 0) rnd.nextDouble() * total else 0.0
      var idx = 0
      while (idx < points.length - 1 && pick > d2(idx)) { pick -= d2(idx); idx += 1 }
      centers(c) = points(idx).clone()
      // fold the new center into the running min distances (parallel)
      val cc = centers(c)
      java.util.stream.IntStream.range(0, points.length).parallel().forEach { i =>
        val d = sqDist(points(i), cc)
        if (d < d2(i)) d2(i) = d
      }
      c += 1
    }
    val dim = points(0).length
    val nThreads = math.max(1, Runtime.getRuntime.availableProcessors())
    var it = 0
    while (it < iters) {
      // parallel assignment: per-thread partial sums, merged after
      // (rayon-parallel in the reference, kmeans_builder.rs:116)
      val chunk = math.max(1, (points.length + nThreads - 1) / nThreads)
      val partials = java.util.stream.IntStream.range(0, nThreads).parallel().mapToObj[
        (Array[Array[Double]], Array[Long])] { t =>
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Long](kk)
        var i = t * chunk
        val end = math.min(points.length, (t + 1) * chunk)
        while (i < end) {
          val p = points(i)
          var best = 0; var bestD = Double.MaxValue; var j = 0
          while (j < kk) { val d = sqDist(p, centers(j)); if (d < bestD) { bestD = d; best = j }; j += 1 }
          val s = sums(best); var c = 0
          while (c < dim) { s(c) += p(c); c += 1 }
          counts(best) += 1
          i += 1
        }
        (sums, counts)
      }.toList
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      partials.forEach { case (ps, pc) =>
        var j = 0
        while (j < kk) {
          val s = sums(j); val p = ps(j); var c = 0
          while (c < dim) { s(c) += p(c); c += 1 }
          counts(j) += pc(j)
          j += 1
        }
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          val s = sums(j); var t = 0
          while (t < dim) { s(t) /= counts(j); t += 1 }
          centers(j) = s
        }
        j += 1
      }
      it += 1
    }
    centers.filter(_ != null)
  }

  /** Lloyd k-means for BIG k (≥ [[prunedKmeansThreshold]]): same update
    * step, two changes that turn the per-iteration cost from O(n·k·d)
    * into roughly O(n·√k·d):
    *
    *   - SEEDING is a deterministic distinct sample (Forgy) instead of
    *     k-means++ — the ++ pass is itself O(n·k·d), and at k a sizable
    *     fraction of n (10k centers from a 20k sample) its advantage
    *     over a plain sample is marginal while its cost matches a whole
    *     exact iteration;
    *   - ASSIGNMENT is pruned through g ≈ √k center GROUPS, re-derived
    *     each iteration from the current centers (stride init + two
    *     exact refinement passes over the k centers — O(k·√k·d), ~10%
    *     of the pruned assignment): each point scans the g group
    *     centers, keeps the `probes` nearest groups, and scans only
    *     their member centers — the same two-level scheme
    *     [[buildPostings]] uses for the full-data pass
    *     (`assignProbeGroups`), applied to training itself.
    *
    * Approximation posture: a point occasionally assigns to a
    * second-best center when the true nearest sits in an unprobed
    * group; Lloyd's update step is robust to that (ProfKmeans measures
    * the mean-nearest-distance gap vs exact at the 1428-center shape —
    * see BASELINE.md). Deterministic for fixed (points, k, seed). */
  private[operators] def localKMeansPruned(
      points: Array[Array[Double]], k: Int, seed: Long, iters: Int): Array[Array[Double]] = {
    val kk = math.min(k, points.length)
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    // Forgy seeding over a deterministic shuffle: kk distinct points
    val perm = rnd.shuffle((0 until points.length).toVector).take(kk)
    val centers = perm.map(points(_).clone()).toArray
    val g = math.max(2, math.ceil(math.sqrt(kk.toDouble)).toInt)
    val probes = math.max(4, g / 16)
    val nThreads = math.max(1, Runtime.getRuntime.availableProcessors())
    var it = 0
    while (it < iters) {
      // ---- regroup the CURRENT centers: stride init + 2 exact passes ----
      var groupCenters = Array.tabulate(g)(j => centers((j * kk) / g).clone())
      val membership = new Array[Int](kk)
      var pass = 0
      while (pass < 2) {
        java.util.stream.IntStream.range(0, kk).parallel().forEach { ci =>
          var best = 0; var bestD = Double.MaxValue; var j = 0
          while (j < groupCenters.length) {
            val d = sqDist(centers(ci), groupCenters(j))
            if (d < bestD) { bestD = d; best = j }; j += 1
          }
          membership(ci) = best
        }
        val sums = Array.fill(g)(new Array[Double](dim))
        val cnts = new Array[Long](g)
        var ci = 0
        while (ci < kk) {
          val s = sums(membership(ci)); val p = centers(ci); var c = 0
          while (c < dim) { s(c) += p(c); c += 1 }
          cnts(membership(ci)) += 1; ci += 1
        }
        groupCenters = Array.tabulate(g) { j =>
          if (cnts(j) > 0) {
            val s = sums(j); var c = 0
            while (c < dim) { s(c) /= cnts(j); c += 1 }
            s
          } else groupCenters(j)
        }
        pass += 1
      }
      // CSR membership lists
      val counts = new Array[Int](g)
      membership.foreach(counts(_) += 1)
      val offsets = new Array[Int](g + 1)
      var j = 0
      while (j < g) { offsets(j + 1) = offsets(j) + counts(j); j += 1 }
      val fill = offsets.clone()
      val memberIdx = new Array[Int](kk)
      var ci = 0
      while (ci < kk) { memberIdx(fill(membership(ci))) = ci; fill(membership(ci)) += 1; ci += 1 }
      // ---- pruned assignment: per-thread partial sums, merged after ----
      val gc = groupCenters
      val chunk = math.max(1, (points.length + nThreads - 1) / nThreads)
      val partials = java.util.stream.IntStream.range(0, nThreads).parallel().mapToObj[
        (Array[Array[Double]], Array[Long])] { t =>
        val sums = Array.fill(kk)(new Array[Double](dim))
        val cnts = new Array[Long](kk)
        val bestG = new Array[Int](probes)
        val bestGD = new Array[Double](probes)
        var i = t * chunk
        val end = math.min(points.length, (t + 1) * chunk)
        while (i < end) {
          val p = points(i)
          // partial-select the `probes` nearest groups
          var nb = 0; var gj = 0
          while (gj < g) {
            val d = sqDist(p, gc(gj))
            if (nb < probes) {
              var ins = nb
              while (ins > 0 && bestGD(ins - 1) > d) {
                bestGD(ins) = bestGD(ins - 1); bestG(ins) = bestG(ins - 1); ins -= 1
              }
              bestGD(ins) = d; bestG(ins) = gj; nb += 1
            } else if (d < bestGD(probes - 1)) {
              var ins = probes - 1
              while (ins > 0 && bestGD(ins - 1) > d) {
                bestGD(ins) = bestGD(ins - 1); bestG(ins) = bestG(ins - 1); ins -= 1
              }
              bestGD(ins) = d; bestG(ins) = gj
            }
            gj += 1
          }
          // scan only the member centers of the probed groups
          var best = -1; var bestD = Double.MaxValue
          var b = 0
          while (b < nb) {
            val grp = bestG(b)
            var m = offsets(grp)
            while (m < offsets(grp + 1)) {
              val cidx = memberIdx(m)
              val d = sqDist(p, centers(cidx))
              if (d < bestD) { bestD = d; best = cidx }
              m += 1
            }
            b += 1
          }
          if (best < 0) { // every probed group empty — exact fallback
            var cj = 0
            while (cj < kk) {
              val d = sqDist(p, centers(cj))
              if (d < bestD) { bestD = d; best = cj }; cj += 1
            }
          }
          val s = sums(best); var c = 0
          while (c < dim) { s(c) += p(c); c += 1 }
          cnts(best) += 1
          i += 1
        }
        (sums, cnts)
      }.toList
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Long](kk)
      partials.forEach { case (ps, pc) =>
        var j2 = 0
        while (j2 < kk) {
          val s = sums(j2); val p = ps(j2); var c = 0
          while (c < dim) { s(c) += p(c); c += 1 }
          cnts(j2) += pc(j2); j2 += 1
        }
      }
      var j3 = 0
      while (j3 < kk) {
        if (cnts(j3) > 0) {
          val s = sums(j3); var t = 0
          while (t < dim) { s(t) /= cnts(j3); t += 1 }
          centers(j3) = s
        }
        j3 += 1
      }
      it += 1
    }
    centers
  }

  /** Nearest-centroid ids for one vector under the multi-assignment rule
    * (builder.rs:292-367): all centroids with dist <= nearest * (1 + pct),
    * capped at maxClustersPerVector, nearest first. */
  private def assignOne(
      v: Array[Double], centers: Array[Array[Double]], maxC: Int, pct: Double): Array[Int] = {
    val dists = new Array[Double](centers.length)
    var j = 0
    while (j < centers.length) { dists(j) = sqDist(v, centers(j)); j += 1 }
    val order = dists.zipWithIndex.sortBy { case (d, i) => (d, i) }
    val lim = math.sqrt(order.head._1) * (1.0 + pct)
    order.take(maxC).filter { case (d, _) => math.sqrt(d) <= lim }.map(_._2)
  }

  /** Train centroids: sample -> k-means -> iterative split of clusters
    * whose posting list would exceed maxPostingListSize.
    * Returns centroids DataFrame `[centroid_id, vector: array<double>]`. */
  def buildCentroids(vectors: DataFrame, params: BuildParams): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._

    val n = vectors.count()
    if (n == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("centroid_id", IntegerType, false),
          StructField("vector", ArrayType(DoubleType, false), false))))

    val frac = math.min(1.0, params.sampleSize.toDouble * 1.2 / n)
    val sample = vectors.select(col("vector").cast("array<double>"))
      .sample(withReplacement = false, frac, params.seed)
      .limit(params.sampleSize)
      .as[Seq[Double]].collect().map(_.toArray)

    var centers: Array[Array[Double]] =
      localKMeans(sample, params.numCentroids, params.seed)

    // Balanced split loop (A2): any cluster with > maxPostingListSize
    // members is re-clustered into ceil(size/max) parts from its own
    // members, inside the task that holds that cluster's rows.
    if (params.maxPostingListSize != Long.MaxValue) {
      var rounds = 0
      var done = false
      while (!done && rounds < 8) {
        val bc = spark.sparkContext.broadcast(centers)
        val maxC = params.maxClustersPerVector
        val pct = params.distanceThresholdPct
        val seed = params.seed
        val maxSize = params.maxPostingListSize
        // nearest-only assignment for sizing
        val assigned = vectors.select(col("vector").cast("array<double>").as("v"))
          .as[Seq[Double]]
          .map { v => (assignOne(v.toArray, bc.value, 1, 0.0).head, v) }
          .toDF("cid", "v")
        val sizes = assigned.groupBy("cid").count()
        val oversized = sizes.filter(col("count") > maxSize).select("cid").as[Int].collect().toSet
        if (oversized.isEmpty) done = true
        else {
          val replacement: Array[Array[Double]] = assigned
            .filter(col("cid").isin(oversized.toSeq: _*))
            .as[(Int, Seq[Double])]
            .groupByKey(_._1)
            .flatMapGroups { (cid, rows) =>
              // Cluster members are bounded (they were one posting list);
              // sample defensively to cap task memory.
              val pts = rows.map(_._2.toArray).take(4 * maxSize.toInt).toArray
              val parts = math.max(2, math.ceil(pts.length.toDouble / maxSize).toInt)
              localKMeans(pts, parts, seed + cid).iterator.map(_.toSeq)
            }.collect().map(_.toArray)
          centers = centers.zipWithIndex.filterNot { case (_, i) => oversized(i) }.map(_._1) ++
            replacement
          rounds += 1
        }
        bc.destroy()
      }
    }

    centers.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid_id", "vector")
  }

  /** Full-data assignment pass: one narrow map against the centroid
    * matrix (codegen kernel, zero boxing — the build's dominant cost at
    * scale), exploding to `[user_id, centroid_id, point_id]` postings. */
  def buildPostings(vectors: DataFrame, centroids: DataFrame, params: BuildParams): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val ordered = centroids.orderBy("centroid_id")
      .select(col("centroid_id").cast("int"), col("vector").cast("array<double>"))
      .as[(Int, Seq[Double])].collect()
    if (ordered.isEmpty)
      return vectors.select(col("user_id"), lit(0).as("centroid_id"), col("point_id")).limit(0)
    val ids = ordered.map(_._1)
    val dim = ordered.head._2.length
    val flat = new Array[Double](ordered.length * dim)
    ordered.zipWithIndex.foreach { case ((_, v), i) =>
      var d = 0
      while (d < dim) { flat(i * dim + d) = v(d); d += 1 }
    }
    val k = ordered.length
    val assigned =
      if (params.assignProbeGroups > 0 && k >= 64) {
        // group centroids into ~sqrt(k) super-clusters (driver-local; the
        // centroid set is small by construction)
        val g = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
        val centroidVecs = ordered.map(_._2.toArray)
        val groupCenters = localKMeans(centroidVecs, g, params.seed + 7, iters = 10)
        val groupFlat = new Array[Double](groupCenters.length * dim)
        groupCenters.zipWithIndex.foreach { case (gc, i) =>
          System.arraycopy(gc, 0, groupFlat, i * dim, dim)
        }
        val membership = centroidVecs.map { cv =>
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < groupCenters.length) {
            val d = sqDist(cv, groupCenters(j)); if (d < bestD) { bestD = d; best = j }; j += 1
          }
          best
        }
        val byGroup = membership.zipWithIndex.groupBy(_._1)
        val offsets = new Array[Int](groupCenters.length + 1)
        val memberIdx = new Array[Int](k)
        var w = 0
        (0 until groupCenters.length).foreach { grp =>
          offsets(grp) = w
          byGroup.getOrElse(grp, Array.empty).foreach { case (_, ci) =>
            memberIdx(w) = ci; w += 1
          }
        }
        offsets(groupCenters.length) = w
        graft.functions.GraftFunctions.nearest_centroids_pruned(
          col("vector"), flat, groupFlat, offsets, memberIdx, dim,
          params.maxClustersPerVector, params.distanceThresholdPct, params.assignProbeGroups)
      } else graft.functions.GraftFunctions.nearest_centroids(
        col("vector"), flat, dim, params.maxClustersPerVector, params.distanceThresholdPct)
    val remap = ids.zipWithIndex.map { case (cid, i) => (i, cid) }.toMap
    val remapUdf = udf { (i: Int) => remap(i) }
    Gen.explodeOnce(vectors, Seq(col("user_id"), col("point_id")), assigned, "cidx")
      .withColumn("centroid_id",
        if (remap.forall { case (i, cid) => i == cid }) col("cidx") else remapUdf(col("cidx")))
      .select("user_id", "centroid_id", "point_id")
  }
}
