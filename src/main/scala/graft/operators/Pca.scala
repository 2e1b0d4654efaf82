package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions._

/** PCA / whitening over an embedding column — the standard preprocessing
  * in front of embedding dedup and ANN (SemDeDup normalizes embeddings;
  * low-rank projection shrinks ANN index memory; whitening decorrelates
  * dimensions so isotropic LSH/IVF geometry holds).
  *
  * Scale shape — exactly one narrow pass over the corpus for statistics
  * and one for application, no shuffles at all:
  *
  *  1. Moments: each partition accumulates (n, Σx, upper-triangular ΣxxT)
  *     imperatively and emits ONE row — d(d+3)/2 doubles. The ≤#partitions
  *     partials collect to the driver (the bounded-sample posture; at
  *     d = 768 a partial is ~2.4 MB, so 1000 executors cost ~2.4 GB spread
  *     over tree-combinable rows; raise partition size before raising d).
  *  2. Eigen-decomposition of the d×d covariance on the driver (cyclic
  *     Jacobi — deterministic, no LAPACK dependency), eigenpairs sorted by
  *     eigenvalue desc, eigenvector sign canonicalized (first nonzero
  *     component positive).
  *  3. Apply: `affine_project` codegen kernel against the broadcast k×d
  *     matrix — whitening folds 1/√(λ+ε) into the matrix rows, so both
  *     variants are the same map-only pass.
  */
object Pca {

  /** Fitted transform. `components` rows are unit eigenvectors (top-k by
    * eigenvalue desc); `eigenvalues` the matching variances. */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Mergeable sufficient statistics (n, Σx, upper-triangular ΣxxT) —
    * the incremental-fit state: moments of yesterday's corpus plus
    * moments of today's batch is the moments of the union, so a standing
    * PCA re-fits from a tiny persisted state without rescanning history
    * (the [[graft.operators.Dedup.incrementalExact]] posture, applied to
    * the embedding transform). */
  final case class Moments(n: Long, sums: Array[Double], gram: Array[Double]) {
    def d: Int = sums.length
    def merge(other: Moments): Moments = {
      require(other.d == d, s"dim mismatch: ${other.d} != $d")
      Moments(n + other.n,
        sums.zip(other.sums).map { case (a, b) => a + b },
        gram.zip(other.gram).map { case (a, b) => a + b })
    }
  }

  /** Exact population covariance of the vector column as a long-form
    * `[i, j, cov]` frame (1-based indices, every (i, j) pair) — the
    * distributed stage of [[train]], exposed separately because it is
    * exactly replayable in SQL (the q74 oracle). */
  def covariance(vecs: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val (n, sums, gram, d) = moments(vecs, vecCol)
    val spark = vecs.sparkSession
    val rows = for (i <- 0 until d; j <- 0 until d) yield {
      val g = if (i <= j) gram(i * d - i * (i - 1) / 2 + (j - i))
              else gram(j * d - j * (j - 1) / 2 + (i - j))
      Row((i + 1).toLong, (j + 1).toLong, g / n - (sums(i) / n) * (sums(j) / n))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("i", LongType, nullable = false),
        StructField("j", LongType, nullable = false),
        StructField("cov", DoubleType, nullable = false))))
  }

  /** One moments pass over a batch — persist the result (3 numbers +
    * d + d(d+1)/2 doubles) and [[Moments.merge]] it with prior state for
    * incremental refits via [[trainFromMoments]]. */
  def fitMoments(vecs: DataFrame, vecCol: String = "embedding"): Moments = {
    val (n, sums, gram, _) = moments(vecs, vecCol)
    Moments(n.toLong, sums, gram)
  }

  /** Fit a k-component model: one moments pass + driver Jacobi eigen. */
  def train(vecs: DataFrame, k: Int, vecCol: String = "embedding"): Model =
    trainFromMoments(fitMoments(vecs, vecCol), k)

  /** Eigen-fit from (possibly merged) sufficient statistics. */
  def trainFromMoments(m: Moments, k: Int): Model = {
    val n = m.n.toDouble
    val sums = m.sums
    val gram = m.gram
    val d = m.d
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val g = if (i <= j) gram(i * d - i * (i - 1) / 2 + (j - i))
              else gram(j * d - j * (j - 1) / 2 + (i - j))
      g / n - mean(i) * mean(j)
    }
    val (values, vectors) = eigSym(cov)
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(r => vectors(r)(c))
      // sign canonicalization for determinism
      val lead = v.find(x => math.abs(x) > 1e-12).getOrElse(1.0)
      if (lead < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.map(values(_)).toArray)
  }

  /** The affine rows `project(whiten = true)` applies — component r
    * scaled by 1/√(λ+ε). Exposed so callers can persist the EXACT
    * transform for oracle replay (q75 persists these + the mean and
    * DuckDB re-derives every projected value as a plain dot product). */
  def whitenedComponents(model: Model, epsilon: Double = 1e-9): Array[Array[Double]] =
    model.components.zip(model.eigenvalues).map { case (row, ev) =>
      val s = 1.0 / math.sqrt(math.max(ev, 0.0) + epsilon); row.map(_ * s)
    }

  /** Map-only projection: `[<id>, proj: array<double>(k)]`. With
    * `whiten = true` each component is scaled by 1/√(λ+ε) so the output
    * has (population) identity covariance. */
  def project(
      vecs: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      whiten: Boolean = false,
      epsilon: Double = 1e-9): DataFrame = {
    val rows = if (!whiten) model.components else whitenedComponents(model, epsilon)
    val flat = rows.flatten
    Par.ensure(vecs).select(col(idCol),
      affine_project(col(vecCol), flat, model.mean, model.dim).as("proj"))
  }

  /** PCA-reduced ANN: stage-1 candidate generation in the reduced space,
    * exact full-space re-rank of the candidates — the memory/IO lever for
    * brute-force-quality search at scale (a k=16 projection of a 768-dim
    * corpus scans 48× fewer bytes in stage 1; stage 2 touches only
    * |queries|·`candidates` full vectors).
    *
    * Plan shape: both stages are the [[Ann.knnJoin]] broadcast pattern —
    * the corpus is never shuffled; stage 2 joins the candidate id set
    * (bounded) back to the full-width table, so the full vectors ride a
    * semi-join-sized exchange only. Exact when `candidates` ≥ corpus.
    *
    * Returns `[q_id, vec_id, dist, rank]` — full-space L2, (dist asc,
    * id asc) rank. */
  def reducedKnnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      model: Model,
      candidates: Int,
      k: Int,
      qIdCol: String = "q_id",
      qVecCol: String = "q_vec",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      projectedCorpus: Option[DataFrame] = None): DataFrame = {
    require(candidates >= k, s"candidates=$candidates < k=$k")
    val flat = model.components.flatten
    // serving shape: the projection is a stored column ([[project]]
    // output, written once at index build) so stage 1 scans k dims, not
    // d; the one-shot default projects inline
    val projCorpus = projectedCorpus
      .map(_.select(col(idCol), col("proj").as("rvec")))
      .getOrElse(Par.ensure(corpus).select(col(idCol),
        affine_project(col(vecCol), flat, model.mean, model.dim).as("rvec")))
    val projQueries = queries.select(col(qIdCol),
      affine_project(col(qVecCol), flat, model.mean, model.dim).as("rq"))
    val cands = Ann.knnJoin(projQueries, projCorpus, candidates,
      qIdCol = qIdCol, qVecCol = "rq", idCol = idCol, vecCol = "rvec")
      .select(col(qIdCol), col(idCol))
    // exact re-rank: candidate ids pull their full vectors; query vectors
    // re-attach from the broadcast set
    cands
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))
      .withColumn("dist", l2_distance(col(vecCol), col(qVecCol)))
      .groupBy(col(qIdCol))
      .agg(topk_by_score(col("dist"), col(idCol).cast("long"), k).as("top"))
      .select(col(qIdCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(qIdCol), col("p.id").as(idCol), col("p.score").as("dist"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** One imperative pass: per-partition (n, Σx, upper-tri ΣxxT) partials,
    * combined on the driver (≤ #partitions rows). */
  private def moments(vecs: DataFrame, vecCol: String): (Double, Array[Double], Array[Double], Int) = {
    val data = Par.ensure(vecs).select(col(vecCol).cast("array<double>"))
    val partials = data.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L
      var sums: Array[Double] = null
      var gram: Array[Double] = null
      var d = 0
      it.foreach { r =>
        val x = r.getArray(0).toDoubleArray()
        if (sums == null) {
          d = x.length
          sums = new Array[Double](d)
          gram = new Array[Double](d * (d + 1) / 2)
        }
        require(x.length == d, s"ragged vector: ${x.length} != $d")
        n += 1
        var i = 0
        var t = 0
        while (i < d) {
          sums(i) += x(i)
          var j = i
          while (j < d) { gram(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, sums, gram, d))
    }.collect()
    require(partials.nonEmpty, "empty input")
    val d = partials.head._4
    require(partials.forall(_._4 == d), "inconsistent dims across partitions")
    val sums = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    var n = 0L
    partials.foreach { case (pn, ps, pg, _) =>
      n += pn
      var i = 0
      while (i < sums.length) { sums(i) += ps(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += pg(i); i += 1 }
    }
    (n.toDouble, sums, gram, d)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvector matrix with eigenvectors as
    * COLUMNS). Deterministic; converges quadratically (50-sweep cap is
    * ~10× more than d = 1024 ever needs). */
  private[graft] def eigSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (sweep < 50 && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    a.foreach(_.foreach(x => s += x * x))
    math.sqrt(s)
  }
}
