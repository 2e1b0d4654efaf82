package graft

import org.apache.spark.sql.SparkSession

import graft.api.{GraftService, InsertRequest}
import graft.core.{AttrField, CollectionConfig}
import graft.operators.DocFilter

/** Served term/hybrid latency measurement (BASELINE.md rows): load the
  * driver's documents table into a text-attributed collection, build the
  * per-user in-memory view, and time the zero-Spark-jobs term and hybrid
  * paths — the serving posture the reference holds with its in-memory
  * per-user `MultiTermIndex` (rs/index/src/multi_terms/index.rs:52).
  *
  * `runMain graft.ProfServe [sfDir] [nQueries]`
  */
object ProfServe {
  private def uuid(n: Long): String = f"00000000-0000-0000-0000-$n%012x"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQueries = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    println(s"[serve] ${docs.length} docs")

    val base = "/tmp/graft_prof_serve"
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete()
    }
    deleteRec(new java.io.File(base))
    val dim = 8
    val svc = new GraftService(spark, base)
    svc.createCollection(CollectionConfig(
      name = "serve_prof", numFeatures = dim, initialNumCentroids = 8,
      attributeSchema = Seq(AttrField("content", "text", "english"))))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[serve] $label%-14s ${(System.nanoTime - t0) / 1e9}%.1f s"); r
    }
    time("insert+flush") {
      svc.insert(InsertRequest(
        "serve_prof",
        docIds = docs.map(d => uuid(d._1)).toSeq,
        userIds = Seq(uuid(0)),
        vectors = docs.flatMap(d =>
          (0 until dim).map(j =>
            (graft.functions.HashKernels.mix64(d._1 * 37L + j) % 1000L).toFloat / 100f)).toSeq,
        attributes = Map("content" -> docs.map(_._2).toSeq)))
      svc.flush("serve_prof")
    }
    val view = time("serve load") { svc.serveUser("serve_prof", uuid(0)) }

    // query terms: words sampled from the corpus (every 97th doc's 3rd word)
    val words = docs.zipWithIndex.collect {
      case ((_, text), i) if i % 97 == 0 =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.length > 2) w(2) else "the"
    }
    require(words.nonEmpty)

    def pct(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted; s(math.min(s.length - 1, (p * s.length).toInt))
    }

    // warm-up then timed term searches
    (0 until 50).foreach(i => view.termSearch(
      DocFilter.Contains("content", words(i % words.length)), limit = 10))
    val termLat = (0 until nQueries).map { i =>
      val t0 = System.nanoTime()
      view.termSearch(DocFilter.Contains("content", words(i % words.length)), limit = 10)
      (System.nanoTime() - t0) / 1e6
    }.toArray
    println(f"[serve] term search   p50 ${pct(termLat, 0.50)}%.2f ms  p99 ${pct(termLat, 0.99)}%.2f ms")

    val qv = (0 until dim).map(_.toFloat)
    (0 until 50).foreach(i => view.search(qv, topK = 10, nprobe = 8,
      filter = Some(DocFilter.Contains("content", words(i % words.length)))))
    val hybridLat = (0 until nQueries).map { i =>
      val t0 = System.nanoTime()
      view.search(qv, topK = 10, nprobe = 8,
        filter = Some(DocFilter.Contains("content", words(i % words.length))))
      (System.nanoTime() - t0) / 1e6
    }.toArray
    println(f"[serve] hybrid search p50 ${pct(hybridLat, 0.50)}%.2f ms  p99 ${pct(hybridLat, 0.99)}%.2f ms")

    val vecLat = (0 until nQueries).map { i =>
      val t0 = System.nanoTime()
      view.search(qv, topK = 10, nprobe = 8, filter = None)
      (System.nanoTime() - t0) / 1e6
    }.toArray
    println(f"[serve] vector search p50 ${pct(vecLat, 0.50)}%.2f ms  p99 ${pct(vecLat, 0.99)}%.2f ms")
    spark.stop()
  }
}
