package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Pins `Ann.diverseSelectExact` to an independent brute-force greedy:
  * the k-center recurrence re-derived in plain Scala from the raw
  * vectors must produce the identical (rank, id, score) sequence, and
  * the emitted sequence must satisfy the greedy-optimality invariant
  * (no unpicked candidate beats pick k's rounded score). */
class DiverseExactSpec extends SparkSuite {

  private def r6(x: Double): Double =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
    s
  }

  test("exact farthest-first matches an independent brute-force greedy") {
    import spark.implicits._
    val rng = new scala.util.Random(97)
    val dim = 8
    val n = 120
    val data = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextDouble() * 10).toSeq)
    }
    val df = data.toDF("vec_id", "embedding").repartition(5)
    val m = 12
    val got = Ann.diverseSelectExact(df, m)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // independent reference (separate code path, same replayable rule)
    val vecs = data.map(_._2.toArray).toArray
    val mean = Array.tabulate(dim)(j => vecs.map(_(j)).sum / n)
    var picked = Set.empty[Int]
    var expected = List.empty[(Long, Long, Double)]
    val minD = Array.fill(n)(Double.PositiveInfinity)
    for (k <- 1 to m) {
      val cands = (0 until n).filterNot(picked)
      val scored = cands.map { i =>
        val s = if (k == 1) r6(d2(vecs(i), mean)) else r6(minD(i))
        (i, s)
      }
      val (bi, bs) = scored.minBy { case (i, s) => (-s, i.toLong) }
      expected ::= ((k.toLong, bi.toLong, bs))
      picked += bi
      (0 until n).filterNot(picked).foreach { i =>
        minD(i) = math.min(minD(i), d2(vecs(i), vecs(bi)))
      }
    }
    assert(got.toSeq == expected.reverse)

    // greedy-optimality invariant straight from the emitted rows
    got.zipWithIndex.drop(1).foreach { case ((_, id, score), idx) =>
      val prior = got.take(idx).map(_._2).toSet
      val bestOutside = (0 until n)
        .filterNot(i => prior.contains(i.toLong))
        .map(i => r6(prior.map(p => d2(vecs(i), vecs(p.toInt))).min))
        .max
      assert(score == bestOutside, s"rank ${idx + 1}: $score vs best $bestOutside")
    }
  }

  test("row cap throws instead of collecting an unbounded corpus") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.diverseSelectExact(df, 5, maxRows = 10)
    }
    assert(e.getMessage.contains("bounded oracle twin"))
  }
}
