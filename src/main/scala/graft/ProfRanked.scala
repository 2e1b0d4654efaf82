package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-attributed profiling of the collection ranked-retrieval read path
  * (q126 family): jobs/stages/tasks per phase via a SparkListener, so the
  * optimization work targets the phase that actually owns the cost.
  * `runMain graft.ProfRanked <sfDir>` (artifacts must exist — run the
  * bench or Explain on q126 first). */
object ProfRanked {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        tasks.addAndGet(s.stageInfo.numTasks)
    })
    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(300)
      val (j0, t0) = (jobs.get, tasks.get)
      val w0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300)
      println(f"[prof] $name%-34s ${dt}%7.2f s  jobs=${jobs.get - j0}%-4d tasks=${tasks.get - t0}%-5d")
      r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import graft.core.{AttrField, Collection, CollectionConfig}
    val base = "/tmp/graft_artifacts/q126"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cfg = CollectionConfig(
      name = "ranked", numFeatures = dim,
      initialNumCentroids = 8, maxClustersPerVector = 2,
      attributeSchema = Seq(AttrField("content", "text", "none"),
        AttrField("title", "text", "none")))
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val snap = phase("open+snapshot") {
        Collection.open(spark, base, cfg).snapshot()
      }
      phase("bm25FieldStats(content)") {
        snap.bm25FieldStats("content", Seq(0L))
      }
      phase("rankedSearch count") {
        snap.rankedSearch("content", "merge join stream", k = 10,
          userIds = Seq(0L)).count()
      }
      phase("rankedSearch count (memo hit)") {
        snap.rankedSearch("content", "merge join stream", k = 10,
          userIds = Seq(0L)).count()
      }
      // the IDEAL single-segment fast-path plan, hand-written: restricted
      // dictionary scan ⋈ ids for tf, lens ⋈ ids for dl, stats as one agg
      // — what the read path would cost if the newest-wins machinery were
      // skippable on a provably duplicate-free snapshot
      phase("ideal: stats agg") {
        val lens = spark.read.parquet(s"$base/ranked/segments/seg_1/lens")
          .filter(col("field") === "content" && col("user_id") === 0L)
        lens.agg(count(lit(1)), avg(col("dl").cast("double"))).head()
      }
      phase("ideal: ranked count") {
        val terms = spark.read.parquet(s"$base/ranked/segments/seg_1/terms")
        val v = spark.read.parquet(s"$base/ranked/segments/seg_1/vectors")
          .select("user_id", "point_id", "doc_id")
        val qts = Seq("content:merge", "content:join", "content:stream")
        val tfs = terms
          .filter(col("user_id") === 0L && col("term").isin(qts: _*))
          .select(col("user_id"), col("term"), col("point_id"),
            size(col("positions")).cast("long").as("tf"))
          .join(v, Seq("user_id", "point_id"))
          .select("user_id", "term", "doc_id", "tf")
        val lens = spark.read.parquet(s"$base/ranked/segments/seg_1/lens")
          .filter(col("field") === "content" && col("user_id") === 0L)
          .join(v, Seq("user_id", "point_id"))
          .select("user_id", "doc_id", "dl")
        graft.operators.Search.bm25Score(tfs, lens, qts, 5000L, 30.0)
          .orderBy(col("score").desc, col("doc_id").asc).limit(10).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
