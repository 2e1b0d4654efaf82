package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Collection, CollectionConfig}
import graft.operators.SearchParams

/** Step-level timing of the q48 collection lifecycle (temporary
  * profiling harness). */
object ProfLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("prof").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(sfDir + "/embeddings.parquet")
    emb.count()
    val base = "/tmp/prof_q48"
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete()
    }
    deleteRec(new java.io.File(base))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rows = emb.select(lit(0L).as("user_id"), col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("vector"))
    rows.count()
    // two passes: second is steady-state (no codegen warm-up)
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      deleteRec(new java.io.File(base))
      val coll = time("create") { Collection.create(spark, base, CollectionConfig(
        name = "lifecycle", numFeatures = dim,
        initialNumCentroids = 8, maxClustersPerVector = 2)) }
      time("insert1") { coll.insert(rows.filter(col("doc_id") % 2 === 0)) }
      time("flush1") { coll.flush() }
      time("insert2") { coll.insert(rows.filter(col("doc_id") % 2 =!= 0)) }
      time("flush2") { coll.flush() }
      time("delete") { coll.delete(rows.filter(col("doc_id") % 10 === 0).select("user_id", "doc_id")) }
      time("merge") { coll.merge() }
      val q0v = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      time("search") { coll.snapshot().search(q0v,
        SearchParams(topK = 10, numExploredCentroids = Some(Int.MaxValue),
          centroidDistanceRatio = 1e18), userIds = Seq(0L)).collect().length }
    }
    spark.stop()
  }
}
