package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Partition-boundary invariance of the distributed star-contraction
  * connected-components path (`Dedup.keepList` with the bounded local
  * fast path disabled): the id -> component-min mapping must equal a
  * driver union-find at EVERY shuffle-partition count. The graph mixes
  * a long shuffled path (forces multiple large/small-star iterations),
  * random clustered edges, self-loops (must register isolated nodes),
  * and duplicate/reversed edges. */
class KeepListInvarianceSpec extends AnyFunSuite {

  private def groundTruth(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = collection.mutable.HashMap(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // component min: union-by-min keeps the root minimal
    nodes.map(n => (n, find(n))).toSet
  }

  test("distributed keepList equals driver union-find at 2/5/11/32 partitions") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val rng = new scala.util.Random(41)
      // long path over shuffled ids: star contraction needs several
      // rounds to collapse it (the convergence loop is exercised)
      val pathIds = rng.shuffle((10000L to 10400L).toVector)
      val path = pathIds.sliding(2).map(p => (p(0), p(1))).toSeq
      // random clustered edges over 1500 nodes in 50 clusters
      val clustered = (0 until 2000).map { _ =>
        val c = rng.nextInt(50)
        (c * 30L + rng.nextInt(30), c * 30L + rng.nextInt(30))
      }
      // self-loops register isolated nodes; reversed duplicates
      val loops = (20000L to 20020L).map(n => (n, n))
      val edges = path ++ clustered ++ loops ++ clustered.take(100).map(_.swap)
      val truth = groundTruth(edges)
      for (np <- Seq(2, 5, 11, 32)) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        val pairs = edges.toDF("a", "b").repartition(7)
        // localEdgeLimit=0 forces the distributed star-contraction path
        val got = Dedup.keepList(pairs, localEdgeLimit = 0L)
          .as[(Long, Long)].collect().toSet
        assert(got == truth,
          s"np=$np: ${got.size} vs truth ${truth.size}; " +
            s"diff=${(got diff truth).take(5)} / ${(truth diff got).take(5)}")
        spark.catalog.clearCache()
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", 32)
  }
}
