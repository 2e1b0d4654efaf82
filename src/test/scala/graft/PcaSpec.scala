package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA / whitening (q74/q75): Jacobi eigen correctness, distributed
  * moments vs a driver reference, planted-direction recovery, whitening
  * identity-covariance, and codegen/interpreted projection parity. */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  // deterministic synthetic embeddings: dominant direction u scaled 5x,
  // second direction w scaled 2x, isotropic jitter
  private def planted(n: Int, d: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val r = rng(seed)
    val u = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 1) 1.0 else 0.0)
    (0 until n).map { id =>
      val a = r.nextGaussian() * 5.0
      val b = r.nextGaussian() * 2.0
      val x = Array.tabulate(d)(i => a * u(i) + b * w(i) + r.nextGaussian() * 0.1)
      (id.toLong, x.toSeq)
    }
  }

  test("eigSym: reconstructs the matrix, orthonormal eigenvectors") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, -0.2),
      Array(0.5, -0.2, 2.0))
    val (values, vectors) = Pca.eigSym(a)
    // V diag(values) V^T == A
    for (i <- 0 until 3; j <- 0 until 3) {
      val rec = (0 until 3).map(c => vectors(i)(c) * values(c) * vectors(j)(c)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-10, s"($i,$j)")
    }
    // columns orthonormal
    for (c1 <- 0 until 3; c2 <- 0 until 3) {
      val dot = (0 until 3).map(r => vectors(r)(c1) * vectors(r)(c2)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-10)
    }
    // trace preserved
    assert(math.abs(values.sum - 9.0) < 1e-10)
  }

  test("covariance: matches a driver reference, symmetric, partition-count invariant") {
    val data = planted(200, 5, seed = 7)
    val df = data.toDF("vec_id", "embedding")
    val got = Pca.covariance(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // driver reference
    val n = data.size.toDouble
    val mean = Array.tabulate(5)(i => data.map(_._2(i)).sum / n)
    for (i <- 0 until 5; j <- 0 until 5) {
      val ref = data.map(v => (v._2(i) - mean(i)) * (v._2(j) - mean(j))).sum / n
      assert(math.abs(got((i + 1L, j + 1L)) - ref) < 1e-9, s"($i,$j)")
      assert(math.abs(got((i + 1L, j + 1L)) - got((j + 1L, i + 1L))) < 1e-12)
    }
    val got7 = Pca.covariance(df.repartition(7)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (k, v) => assert(math.abs(got7(k) - v) < 1e-9) }
  }

  test("train: planted directions recovered in variance order, deterministic") {
    val df = planted(500, 8, seed = 11).toDF("vec_id", "embedding")
    val m = Pca.train(df, k = 3)
    assert(m.k === 3 && m.dim === 8)
    // eigenvalues descending; top two match the planted 25x / 4x variances
    assert(m.eigenvalues(0) >= m.eigenvalues(1) && m.eigenvalues(1) >= m.eigenvalues(2))
    assert(math.abs(m.components(0)(0)) > 0.99, "first component is the planted u")
    assert(math.abs(m.components(1)(1)) > 0.99, "second component is the planted w")
    val m2 = Pca.train(df, k = 3)
    assert(m.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    assert(m.eigenvalues.toSeq === m2.eigenvalues.toSeq)
  }

  test("project: parity with a driver-side reference; whitening yields identity covariance") {
    val data = planted(400, 6, seed = 23)
    val df = data.toDF("vec_id", "embedding")
    val m = Pca.train(df, k = 4)
    val proj = Pca.project(df, m, whiten = false).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    // reference projection for the first few rows
    data.take(10).foreach { case (id, x) =>
      val want = m.components.map(row =>
        row.indices.map(j => row(j) * (x(j) - m.mean(j))).sum)
      val gotRow = proj.find(_._1 == id).get._2
      want.zip(gotRow).foreach { case (w, g) => assert(math.abs(w - g) < 1e-9) }
    }
    // whitened output has ~identity population covariance
    val white = Pca.project(df, m, whiten = true).select(col("proj"))
      .collect().map(_.getSeq[Double](0))
    val n = white.length.toDouble
    for (a <- 0 until 4; b <- 0 until 4) {
      val ma = white.map(_(a)).sum / n
      val mb = white.map(_(b)).sum / n
      val cv = white.map(v => (v(a) - ma) * (v(b) - mb)).sum / n
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(cv - want) < 0.02, s"whitened cov($a,$b)=$cv")
    }
  }

  test("incremental fit: merged batch moments equal the full-corpus fit") {
    val all = planted(300, 6, seed = 31)
    val (b1, b2) = all.splitAt(180)
    val mFull = Pca.fitMoments(all.toDF("vec_id", "embedding"))
    val mMerged = Pca.fitMoments(b1.toDF("vec_id", "embedding"))
      .merge(Pca.fitMoments(b2.toDF("vec_id", "embedding")))
    assert(mMerged.n === mFull.n)
    mFull.sums.zip(mMerged.sums).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    mFull.gram.zip(mMerged.gram).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
    // the refit from merged state matches the one-shot fit
    val tFull = Pca.trainFromMoments(mFull, k = 3)
    val tInc = Pca.trainFromMoments(mMerged, k = 3)
    tFull.eigenvalues.zip(tInc.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8)
    }
    tFull.components.flatMap(_.toSeq).zip(tInc.components.flatMap(_.toSeq))
      .foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
  }

  test("reducedKnnJoin: exact with full candidates, high recall reduced") {
    // clustered corpus so a low-rank projection preserves neighborhoods
    val r = rng(41)
    val centers = Array.fill(8)(Array.fill(16)(r.nextGaussian() * 3.0))
    val corpus = (0 until 400).map { id =>
      val c = centers(id % 8)
      (id.toLong, c.map(_ + r.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = (0 until 6).map { q =>
      val c = centers(q % 8)
      (q.toLong, c.map(_ + r.nextGaussian() * 0.3).toSeq)
    }.toDF("q_id", "q_vec")
    val model = Pca.train(corpus, k = 6)
    val exact = graft.operators.Ann.knnJoin(queries, corpus, k = 10)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // candidates = corpus size -> identical to exact (full-space rerank)
    val full = Pca.reducedKnnJoin(queries, corpus, model, candidates = 400, k = 10)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(full === exact)
    // tight candidate budget still recalls nearly everything
    val reduced = Pca.reducedKnnJoin(queries, corpus, model, candidates = 40, k = 10)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map(q => (reduced(q) & exact(q)).size).sum
    val recall = hits.toDouble / (exact.size * 10)
    assert(recall >= 0.9, s"recall $recall")
  }
}
