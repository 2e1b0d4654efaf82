package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, ProductQuantizer, ServedIvfIndex}

/** Demo-scale measurement harness (BASELINE.md): synthetic N x 768
  * vectors in the reference's 1M-demo shape (py/collection_config.json:
  * 1500 clusters, scaled proportionally), measuring IVF index build,
  * batch query throughput, and recall@10 vs brute force.
  *
  * `runMain graft.Scale [N] [numQueries]` — defaults 100000, 100.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val nq = if (args.length > 1) args(1).toInt else 100
    val dim = 768
    val clusters = math.max(16, (1500.0 * n / 1000000.0).toInt) // demo ratio
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic embeddings: hash-mixed pseudo-gaussian-ish,
    // 64 planted cluster directions (recall is meaningful, not degenerate)
    val genUdf = udf { (id: Long) =>
      val c = (id % 64).toInt
      Array.tabulate(dim) { d =>
        val base = if (d % 64 == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(id * 131071L + d)
        base + (h.toDouble / Long.MaxValue.toDouble)
      }
    }
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      genUdf(col("id")).as("embedding"))
      .repartition(cpus.toInt).persist()
    emb.count() // materialize generation outside the timed section

    val t0 = System.nanoTime()
    // two-level pruned assignment (ROADMAP #1): probe 8 super-groups
    val (centroids, postings) = Ann.ivfIndex(emb, numCentroids = clusters,
      assignProbeGroups = 8)
    val nPostings = postings.persist().count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val nprobe = math.max(8, clusters / 16)
    val queryDf = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

    // batch path: whole query set in one job (the throughput number)
    val t1 = System.nanoTime()
    val batchRows = Ann.ivfTopKBatch(queryDf, emb, centroids, postings,
      k = 10, nprobe = nprobe).count()
    val querySec = (System.nanoTime() - t1) / 1e9

    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))

    // recall vs brute force on a subsample of queries
    val sample = queries
    val recall = sample.map { case (qid, q) =>
      val oracle = Ann.bruteForceTopK(emb, q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val got = Ann.ivfTopK(emb, centroids, postings, q, 10, nprobe)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      oracle.intersect(got).size / 10.0
    }.sum / sample.length

    // corpus-vs-corpus kNN graph (round 4): every vector's k=10 nearest
    // among all others via IVF co-partitioning — the honest cost here is
    // sum over centroids of |Q_c| x |V_c| distance evals, so the measured
    // number is edges/sec at the approximate-nprobe setting, plus edge
    // recall vs brute force on sampled nodes. Runs on a bounded subset
    // (arg 3, default 20000) so the default Scale invocation stays fast.
    val graphN = math.min(n, if (args.length > 2) args(2).toInt else 20000)
    val embG = emb.filter(col("vec_id") < graphN)
    val t5 = System.nanoTime()
    val graph = Ann.knnGraph(embG, k = 10,
      numCentroids = math.max(16, (1500.0 * graphN / 1000000.0).toInt),
      nprobe = 8).persist()
    val nEdges = graph.count()
    val graphSec = (System.nanoTime() - t5) / 1e9
    val gEdges = graph.filter(col("q_id") < 20).select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val graphRecall = queries.map { case (qid, q) =>
      val oracle = Ann.bruteForceTopK(embG, q, 11)
        .select("vec_id").collect().map(_.getLong(0))
        .filter(_ != qid).take(10).toSet
      gEdges.getOrElse(qid, Set.empty[Long]).intersect(oracle).size / 10.0
    }.sum / queries.length
    graph.unpersist(blocking = false)

    // served per-query path (ROADMAP #2): load the index into serving
    // memory once, then measure single-query latency with zero Spark jobs.
    // NOTE: ServedIvfIndex.build collects the shard it serves — bounded by
    // the serving-shard size (here the whole demo corpus; ~n*dim*8 bytes
    // of driver memory), NOT a distributed operator
    val t3 = System.nanoTime()
    val served = ServedIvfIndex.build(emb, centroids, postings)
    val servedLoadSec = (System.nanoTime() - t3) / 1e9
    val latQueries = queries.map(_._2.toArray)
    served.search(latQueries.head, 10, nprobe) // warm-up
    val lats = latQueries.flatMap { q =>
      Seq.fill(5) {
        val s = System.nanoTime()
        served.search(q, 10, nprobe)
        (System.nanoTime() - s) / 1e6
      }
    }.sorted
    val servedP50 = lats(lats.length / 2)
    val servedP99 = lats(math.min(lats.length - 1, (lats.length * 99) / 100))
    // parity: served results must equal the distributed probe path
    val servedParity = queries.take(5).forall { case (_, q) =>
      val oracle = Ann.ivfTopK(emb, centroids, postings, q, 10, nprobe)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      served.search(q.toArray, 10, nprobe).map(_._1).toSeq == oracle
    }

    // PQ at the demo compression point (768 dims -> 96 bytes)
    val t2 = System.nanoTime()
    val model = ProductQuantizer.train(emb, "embedding", numSubvectors = 96,
      numBits = 8, sampleSize = 10000)
    val pqTrainSec = (System.nanoTime() - t2) / 1e9

    println(s"""{"n":$n,"dim":$dim,"clusters":$clusters,"postings":$nPostings,""" +
      s""""build_sec":${f"$buildSec%.1f"},"batch_${nq}q_sec":${f"$querySec%.1f"},""" +
      s""""qps":${f"${nq / querySec}%.1f"},"recall_at10_nprobe$nprobe":${f"$recall%.3f"},""" +
      s""""served_load_sec":${f"$servedLoadSec%.1f"},"served_p50_ms":${f"$servedP50%.2f"},""" +
      s""""served_p99_ms":${f"$servedP99%.2f"},"served_parity":$servedParity,""" +
      s""""knn_graph_n":$graphN,"knn_graph_sec":${f"$graphSec%.1f"},""" +
      s""""knn_graph_edges":$nEdges,"knn_graph_edges_per_sec":${f"${nEdges / graphSec}%.0f"},""" +
      s""""knn_graph_recall_at10":${f"$graphRecall%.3f"},""" +
      s""""pq_train_sec":${f"$pqTrainSec%.1f"}}""")
    spark.stop()
  }
}
