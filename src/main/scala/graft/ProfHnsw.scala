package graft

// scratch diagnostic main — not part of the library surface
import graft.operators.Hnsw

/** Times the sequential vs batch-parallel HNSW bulk build and checks
  * recall parity. No Spark — the graph is a serving-process structure. */
object ProfHnsw {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val dim = if (args.length > 1) args(1).toInt else 128
    val par = if (args.length > 2) args(2).toInt else Runtime.getRuntime.availableProcessors
    val nClusters = if (args.length > 3 && !args(3).startsWith("--")) args(3).toInt else 64
    val m = if (args.length > 4 && !args(4).startsWith("--")) args(4).toInt else 16
    val efC = if (args.length > 5 && !args(5).startsWith("--")) args(5).toInt else 100
    val pts = Array.tabulate(n) { i =>
      val c = i % nClusters
      val v = Array.tabulate(dim) { d =>
        val base = if (d % nClusters == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(i.toLong * 7919L + d)
        base + h.toDouble / Long.MaxValue.toDouble
      }
      (i.toLong, v)
    }
    def brute(q: Array[Double], k: Int): Set[Long] =
      pts.map { case (id, v) =>
        var acc = 0.0; var d = 0
        while (d < v.length) { val x = q(d) - v(d); acc += x * x; d += 1 }
        (acc, id)
      }.sortBy(identity).take(k).map(_._2).toSet
    def recall(g: Hnsw, ef: Int = 100): Double = {
      val rs = (0 until 25).map { qi =>
        val q = pts(qi * 37)._2
        brute(q, 10).intersect(g.search(q, 10, ef = ef).map(_._1).toSet).size / 10.0
      }
      rs.sum / rs.length
    }
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[hnsw] $label%-28s ${(System.nanoTime - t0) / 1e9}%.1f s"); r
    }
    val gp = timed(s"parallel build (p=$par m=$m efC=$efC)") {
      Hnsw.build(pts.map(_._1), pts.map(_._2), m = m, efConstruction = efC, parallelism = par)
    }
    for (ef <- Seq(100, 200, 400))
      println(f"[hnsw] parallel recall@10 ef=$ef%-4d ${recall(gp, ef)}%.3f")
    val qs = (0 until 200).map(qi => pts((qi * 4999) % n)._2)
    val t0 = System.nanoTime
    qs.foreach(q => gp.search(q, 10, ef = 100))
    println(f"[hnsw] query ms (ef=100)           ${(System.nanoTime - t0) / 1e6 / qs.length}%.2f")
    // persistence round-trip: the restart path — save once at "flush",
    // load instead of rebuilding (VERDICT r5 #1)
    val dir = java.nio.file.Files.createTempDirectory("profhnsw")
    val binPath = dir.resolve("hnsw.bin").toString
    timed("save graph") { Hnsw.save(binPath, gp) }
    println(f"[hnsw] graph file MB               ${java.nio.file.Files.size(java.nio.file.Paths.get(binPath)) / 1e6}%.1f")
    val gl = timed("load graph (restart path)") {
      Hnsw.load(binPath, pts.map(_._1), pts.map(_._2)).get
    }
    val same = (0 until 50).forall { qi =>
      val q = pts((qi * 997) % n)._2
      gl.search(q, 10, 100).toSeq == gp.search(q, 10, 100).toSeq
    }
    println(s"[hnsw] loaded == built             $same")
    if (!args.contains("--par-only")) {
      val gs = timed("sequential build") { Hnsw.build(pts.map(_._1), pts.map(_._2)) }
      for (ef <- Seq(100, 200, 400))
        println(f"[hnsw] sequential recall@10 ef=$ef%-2d ${recall(gs, ef)}%.3f")
    }
  }
}
