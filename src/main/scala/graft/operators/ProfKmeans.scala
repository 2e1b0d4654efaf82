package graft.operators

/** Micro-profile of the flush-time driver k-means (round-12 verdict #3,
  * round-13 verdict #4): the driver Lloyd loop is linear in k on the
  * exact path (19.4 s at 20k×1428×768×20), so at the
  * tens-of-thousands-of-centroids regime a 100 TB segment needs, the
  * driver binds on it. Round 14 routes k ≥
  * [[IvfBuilder.prunedKmeansThreshold]] through the two-level pruned
  * assignment ([[IvfBuilder.localKMeansPruned]]); this harness sweeps k
  * and prints, per k: the dispatched path's time, the exact path's time
  * (the A/B), and both paths' clustering cost (mean distance to the
  * nearest center over a fixed sample) — so the near-flat-in-√k claim
  * and the approximation gap are measured, not asserted. Pure JVM, no
  * Spark.
  *
  * `runMain graft.operators.ProfKmeans [n] [dim] [iters] [k1,k2,...]`
  * — defaults 20000 768 20 1428,10000 (the ScaleTenants flush shape and
  * the big-k regime). Pass exact ks to reproduce a single row.
  */
object ProfKmeans {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val dim = if (args.length > 1) args(1).toInt else 768
    val iters = if (args.length > 2) args(2).toInt else 20
    val ks = (if (args.length > 3) args(3) else "1428,10000")
      .split(",").map(_.trim.toInt).toSeq
    val rnd = new scala.util.Random(7)
    // clustered generator (64 planted directions + noise) so convergence
    // behaves like the harness corpus, not like uniform noise
    val points = Array.tabulate(n) { i =>
      val c = i % 64
      Array.tabulate(dim) { d =>
        (if (d % 64 == c) 4.0 else 0.0) + rnd.nextDouble()
      }
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // quality proxy: mean distance to nearest center over a fixed sample
    val sample = points.take(2000)
    def cost(centers: Array[Array[Double]]): Double = sample.map { p =>
      var best = Double.MaxValue
      var j = 0
      while (j < centers.length) {
        val c = centers(j); var s = 0.0; var t = 0
        while (t < dim) { val dd = p(t) - c(t); s += dd * dd; t += 1 }
        if (s < best) best = s
        j += 1
      }
      math.sqrt(best)
    }.sum / sample.length
    // warm-up at a small shape so JIT doesn't bill the first measurement
    IvfBuilder.localKMeansExact(points.take(2000), 64, 1L, iters = 3)
    IvfBuilder.localKMeansPruned(points.take(4000), 600, 1L, iters = 3)
    println(f"[kmeans] n=$n dim=$dim iters=$iters (pruned threshold = ${IvfBuilder.prunedKmeansThreshold})")
    println(f"[kmeans] ${"k"}%8s ${"dispatch"}%10s ${"t_dispatch"}%11s ${"t_exact"}%9s ${"cost_disp"}%10s ${"cost_exact"}%11s")
    ks.foreach { k =>
      val (cd, td) = time(IvfBuilder.localKMeans(points, k, 42L, iters = iters))
      val (ce, te) = time(IvfBuilder.localKMeansExact(points, k, 42L, iters = iters))
      val path = if (k >= IvfBuilder.prunedKmeansThreshold) "pruned" else "exact"
      println(f"[kmeans] $k%8d $path%10s ${td}%10.2fs ${te}%8.2fs ${cost(cd)}%10.4f ${cost(ce)}%11.4f")
    }
  }
}
