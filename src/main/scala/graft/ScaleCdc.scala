package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Collection, CollectionConfig}

/** CDC scale measurement (BASELINE.md): N x 768 synthetic corpus in one
  * flushed segment, then a small delta (deletes + inserts) in a second
  * version; measures `Collection.changes` between the two versions and,
  * for contrast, a full-corpus diff of the same two snapshots with no
  * touched-key restriction. The claim under test is the 100 TB posture:
  * changes() shuffles O(delta) keys (the WAL interval), probing the base
  * only through column-pruned key scans — so its cost must not grow with
  * the vector payload or the untouched corpus, while the unrestricted
  * diff pays a corpus-wide exchange.
  *
  * `runMain graft.ScaleCdc [N] [deltaDeletes] [deltaInserts]` —
  * defaults 200000, 1000, 2000.
  */
object ScaleCdc {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val nDel = if (args.length > 1) args(1).toLong else 1000L
    val nIns = if (args.length > 2) args(2).toLong else 2000L
    val dim = 768
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cdc] $label%-28s $s%.2f s"); (r, s)
    }

    // same deterministic generator shape as graft.Scale
    val genUdf = udf { (id: Long) =>
      val c = (id % 64).toInt
      Array.tabulate(dim) { d =>
        val base = if (d % 64 == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(id * 131071L + d)
        base + (h.toDouble / Long.MaxValue.toDouble)
      }
    }
    val rows = spark.range(n).select(
      lit(0L).as("user_id"), col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))

    val base = "/tmp/scale_cdc"
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete()
    }
    deleteRec(new java.io.File(base))
    val coll = Collection.create(spark, base, CollectionConfig(
      name = "cdc", numFeatures = dim,
      initialNumCentroids = math.max(16, (n / 700L).toInt),
      maxClustersPerVector = 2))

    time(s"corpus insert (${n})")(coll.insert(rows))
    time("corpus flush -> v1")(coll.flush())

    // delta: delete nDel existing keys, insert nIns new keys
    val delKeys = spark.range(nDel)
      .select(lit(0L).as("user_id"), (col("id") * (n / nDel)).as("doc_id"))
    val insRows = spark.range(n, n + nIns).select(
      lit(0L).as("user_id"), col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))
    time(s"delta delete (${nDel})")(coll.delete(delKeys))
    time(s"delta insert (${nIns})")(coll.insert(insRows))
    time("delta flush -> v2")(coll.flush())

    // warm both paths once (codegen/JIT), then measure
    def restricted() = coll.changes(1L, 2L).groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def unrestricted() = {
      val a = coll.snapshotAt(1L).liveDocs.get.withColumnRenamed("src_batch", "fb")
      val b = coll.snapshotAt(2L).liveDocs.get.withColumnRenamed("src_batch", "tb")
      a.join(b, Seq("user_id", "doc_id"), "full_outer")
        .withColumn("change_type",
          when(col("fb").isNull, "insert").when(col("tb").isNull, "delete")
            .when(col("fb") =!= col("tb"), "update"))
        .filter(col("change_type").isNotNull)
        .groupBy("change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    restricted(); unrestricted()
    val (cr, tRestricted) = time("changes(v1,v2) O(delta)")(restricted())
    val (cu, tFull) = time("full-corpus diff (contrast)")(unrestricted())
    require(cr == cu, s"restricted $cr != unrestricted $cu")
    require(cr("delete") == nDel && cr("insert") == nIns, s"unexpected delta: $cr")

    // the CONSUMER side (q103's shape at scale): apply the delta to a
    // parquet mirror of v1 — deletes/updates anti-join out, inserts/
    // updates fetch payload from v2's liveRows semi-joined to the delta
    // keys. The claim: apply cost is O(delta) fetch + O(mirror) rewrite,
    // never a corpus-wide join of vector payloads.
    val mirrorPath = s"$base/mirror"
    time("mirror seed (v1 liveRows)") {
      coll.snapshotAt(1L).liveRows.get.select("doc_id", "vector")
        .write.mode("overwrite").parquet(mirrorPath)
    }
    val (_, tApply) = time(s"mirror apply (${nDel + nIns} delta)") {
      val delta = coll.changes(1L, 2L).cache()
      val gone = delta.filter(col("change_type").isin("delete", "update")).select("doc_id")
      val ups = delta.filter(col("change_type").isin("insert", "update"))
        .select("user_id", "doc_id")
      val fetched = coll.snapshotAt(2L).liveRowsFor(Some(ups)).get
        .select("doc_id", "vector")
      spark.read.parquet(mirrorPath)
        .join(gone, Seq("doc_id"), "left_anti").unionByName(fetched)
        .write.mode("overwrite").parquet(s"$base/mirror_v2")
      delta.unpersist()
    }
    val mirrorCount = spark.read.parquet(s"$base/mirror_v2").count()
    require(mirrorCount == n - nDel + nIns, s"mirror diverged: $mirrorCount")

    println(s"""{"op":"cdc","n":$n,"delta":${nDel + nIns},""" +
      f""""changes_sec":$tRestricted%.2f,"full_diff_sec":$tFull%.2f,""" +
      f""""mirror_apply_sec":$tApply%.2f}""")
    spark.stop()
  }
}
