package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Opq, ProductQuantizer}

/** OPQ scale profile: does the learned rotation stay affordable at the
  * 1M×768 flush shape, and does it actually beat PQ there?
  *
  * The flush-time cost OPQ adds over PQ is all driver-side and
  * sample-bounded: (opqIters+1) codebook fits instead of 1, plus per
  * iteration one n×d rotation, one n→d×d cross-covariance GEMM, and one
  * d×d SVD (breeze), plus the d×d PCA-allocation eigen at init. The
  * distributed side is identical to PQ (one extra d×d mat-vec inside the
  * encode UDF). This main measures each piece at a stated (sample, dim)
  * and prints the PQ-vs-OPQ sample MSE so the win is visible at the same
  * shape.
  *
  * Usage: runMain graft.ProfOpq [sample] [dim] [m] [bits] [iters]
  * Defaults: 20000 x 768, m=96, bits=8, iters=6 (the 1M-demo shape).
  */
object ProfOpq {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val dim = if (args.length > 1) args(1).toInt else 768
    val m = if (args.length > 2) args(2).toInt else 96
    val bits = if (args.length > 3) args(3).toInt else 8
    val iters = if (args.length > 4) args(4).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // NOTE heap: spark.driver.memory is a NO-OP set from inside an
    // already-running local-mode JVM (the heap is fixed at launch), and
    // the driver-side SVD/covariance work is exactly what this profiler
    // measures — size the heap at launch via SPARK_DRIVER_MEM=48g
    // (build.sbt wires it into the forked -Xmx), never here (a builder
    // config would just mislead).
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // correlated synthetic corpus: half the dims echo the other half
    // (latent j %% (dim/2)) — the cross-split correlation PQ cannot
    // exploit and OPQ exists for
    val emb = spark.range(n).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
        cast(sin((id * 2654435761 + (j % ${dim / 2}) * 40503) % 100000) * 2.0 +
             sin(id * 97 + j * 131) * 0.2 as double))""").as("embedding"))
      .cache()
    println(s"[prof] sample corpus $n x $dim (m=$m, bits=$bits, iters=$iters), " +
      s"${emb.count()} rows")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val pq = time(s"PQ train (the baseline cost)") {
      ProductQuantizer.train(emb, "embedding", m, bits, sampleSize = n)
    }
    val opq = time(s"OPQ train (${iters + 1} fits + $iters rotation updates)") {
      Opq.train(emb, "embedding", m, bits, sampleSize = n, opqIters = iters)
    }

    import spark.implicits._
    val sample = emb.select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    def pqMse(model: ProductQuantizer.Model): Double = {
      var s = 0.0
      sample.foreach { v =>
        val y = model.decode(model.encode(v))
        v.indices.foreach { j => val d = v(j) - y(j); s += d * d }
      }
      s / sample.length
    }
    val e0 = time("PQ sample MSE")(pqMse(pq))
    val e1 = time("OPQ sample MSE")(opq.mse(sample))
    println(f"[prof] sample MSE: PQ $e0%.4f vs OPQ $e1%.4f " +
      f"(${(1 - e1 / e0) * 100}%.1f%% lower)")

    val t0 = System.nanoTime()
    val cnt = emb.withColumn("codes", Opq.encodeCol(opq, col("embedding")))
      .select(sum(expr("length(codes)"))).head().getLong(0)
    println(f"[prof] distributed encode of $n rows: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s ($cnt code bytes)")
    spark.stop()
  }
}
