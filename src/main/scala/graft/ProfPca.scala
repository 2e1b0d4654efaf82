package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pca}

/** PCA scale profile: moments pass + eigen + map-only projection + the
  * reduce->rerank search path at a serving-like shape.
  *
  * Usage: runMain graft.ProfPca [n] [dim] [k] [candidates]
  * Defaults: 200000 x 768, k=16, candidates=200 (the 1M-demo dim).
  */
object ProfPca {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 768
    val k = if (args.length > 2) args(2).toInt else 16
    val candidates = if (args.length > 3) args(3).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // heap must come from launch options, not here: spark.driver.memory
      // is a no-op on a running local-mode JVM — use SPARK_DRIVER_MEM=48g
      // (build.sbt wires it into the forked -Xmx)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // clustered synthetic corpus (deterministic; 256 planted directions),
    // written to parquet so every measurement below pays real scan cost —
    // the shape that matters at 100 TB, where the corpus never fits in
    // memory and stage-1's k-dim column prune is the whole point
    val numClusters = 256
    val base = "/tmp/graft_prof_pca"
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
        cast(sin((id % $numClusters) * 2654435761 + j * 40503) * 3.0 +
             sin(id * 2654435761 + j * 97) * 0.3 as double))""").as("embedding"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$base/corpus")
    val corpus = spark.read.parquet(s"$base/corpus")
    println(s"[prof] corpus $n x $dim (${corpus.count()} rows on parquet)")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val model = time(s"train (moments pass + eigen, k=$k)") {
      Pca.train(corpus, k = k)
    }
    val explained = model.eigenvalues.sum
    println(f"[prof] top-$k eigenvalue mass: $explained%.2f")

    time("project (map-only apply pass)") {
      Pca.project(corpus, model, whiten = true)
        .agg(sum(element_at(col("proj"), 1))).collect()
    }

    val queries = corpus.limit(16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .collect()
    val queriesDf = queries.map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .toDF("q_id", "q_vec")
    val reduced = time(s"reducedKnnJoin (16 queries, cand=$candidates, k=10)") {
      Pca.reducedKnnJoin(queriesDf, corpus, model, candidates = candidates, k = 10)
        .collect()
    }
    // serving shape: projection pre-materialized as a stored parquet
    // column (written once at index build)
    Pca.project(corpus, model).write.mode("overwrite").parquet(s"$base/proj")
    val projected = spark.read.parquet(s"$base/proj")
    time(s"reducedKnnJoin over stored projection (16 queries, cand=$candidates)") {
      Pca.reducedKnnJoin(queriesDf, corpus, model, candidates = candidates, k = 10,
        projectedCorpus = Some(projected)).collect()
    }
    val exact = time("exact knnJoin (16 queries, k=10)") {
      Ann.knnJoin(queriesDf, corpus, k = 10).collect()
    }
    val exactSets = exact.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val redSets = reduced.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exactSets.keys.toSeq
      .map(q => (redSets.getOrElse(q, Set.empty[Long]) & exactSets(q)).size.toDouble)
      .sum / (exactSets.size * 10.0)
    println(f"[prof] reduce->rerank recall@10: $recall%.3f")
    spark.stop()
  }
}
