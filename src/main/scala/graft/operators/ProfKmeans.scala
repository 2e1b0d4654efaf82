package graft.operators

/** Micro-profile of the flush-time driver k-means (round-12 verdict #3):
  * ScaleTenants' 1M x 768 flush spends ~296 s total, attributed to the
  * driver Lloyd loop (20k sample x 1428 centroids x 768 dims x 20 iters)
  * plus the bucketed write. This isolates the k-means: pure JVM, no
  * Spark — seeding vs iteration cost at the exact shape, before/after
  * the assignment-path optimizations.
  *
  * `runMain graft.operators.ProfKmeans [n] [k] [dim] [iters]`
  * — defaults 20000 1428 768 20 (the ScaleTenants flush shape).
  */
object ProfKmeans {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val k = if (args.length > 1) args(1).toInt else 1428
    val dim = if (args.length > 2) args(2).toInt else 768
    val iters = if (args.length > 3) args(3).toInt else 20
    val rnd = new scala.util.Random(7)
    // clustered generator (64 planted directions + noise) so convergence
    // behaves like the harness corpus, not like uniform noise
    val points = Array.tabulate(n) { i =>
      val c = i % 64
      Array.tabulate(dim) { d =>
        (if (d % 64 == c) 4.0 else 0.0) + rnd.nextDouble()
      }
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kmeans] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up at a small shape so JIT doesn't bill the first measurement
    IvfBuilder.localKMeans(points.take(2000), math.min(k, 64), 1L, iters = 3)
    val centers = time(s"localKMeans n=$n k=$k d=$dim it=$iters") {
      IvfBuilder.localKMeans(points, k, 42L, iters = iters)
    }
    println(s"[kmeans] centers=${centers.length}")
    // quality proxy: mean distance to nearest center over a fixed sample
    val sample = points.take(2000)
    val cost = sample.map { p =>
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
    println(f"[kmeans] mean-nearest-dist $cost%.4f")
  }
}
