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
    // 32 concurrent parquet writers × the default 128 MB row-group buffer
    // is ~4 GB of writer state in this single 8 GB JVM — a real cluster
    // spreads those writers across executors. 32 MB row groups keep the
    // wide-payload (768-dim array) rewrites inside the harness envelope.
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 32 << 20)

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

    // The BUCKETED mirror (round-12 verdict #2): the naive apply above is
    // O(delta) fetch + O(mirror) rewrite — the rewrite half is the
    // storage-format floor this layout removes. A small follow-up delta
    // (60 keys) is applied two ways to the same v2 state: the naive
    // full-rewrite, and CdcMirror's bucket-granular apply (touched
    // buckets only). At 100 TB the bucket count scales with the corpus
    // (bucket ≈ a task's worth of bytes), so a small delta always
    // touches a small fraction — numBuckets=1024 at 200k rows models
    // that regime (~60 touched of 1024 -> ~6% of the corpus rewritten).
    import graft.operators.CdcMirror
    val nSmall = 30L
    val delKeys3 = spark.range(nSmall)
      .select(lit(0L).as("user_id"), (col("id") * (n / nSmall) + 1L).as("doc_id"))
    val insRows3 = spark.range(n + nIns, n + nIns + nSmall).select(
      lit(0L).as("user_id"), col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))
    coll.delete(delKeys3); coll.insert(insRows3)
    time("small delta flush -> v3")(coll.flush())
    val numBuckets = 1024
    time(s"bucketed mirror seed ($numBuckets buckets)") {
      CdcMirror.seed(coll.snapshotAt(2L).liveRows.get.select("doc_id", "vector"),
        s"$base/mirror_bucketed", "doc_id", numBuckets)
    }
    // Materialize the O(delta) fetch ONCE, outside both timed windows —
    // it is identical on both sides (and already measured by the q103
    // path above), so timing it twice would just bury the quantity under
    // test: the mirror REWRITE cost, naive O(mirror) vs bucketed
    // O(touched buckets).
    val delta3 = coll.changes(2L, 3L).cache()
    val gone3 = delta3.filter(col("change_type").isin("delete", "update"))
      .select("doc_id").cache()
    val ups3 = delta3.filter(col("change_type").isin("insert", "update"))
      .select("user_id", "doc_id")
    val fetched3 = coll.snapshotAt(3L).liveRowsFor(Some(ups3)).get
      .select("doc_id", "vector").cache()
    gone3.count(); fetched3.count()
    val (_, tNaiveSmall) = time(s"naive rewrite (${2 * nSmall} delta)") {
      spark.read.parquet(s"$base/mirror_v2")
        .join(gone3, Seq("doc_id"), "left_anti").unionByName(fetched3)
        .write.mode("overwrite").parquet(s"$base/mirror_v3")
    }
    val (touched, tBucketed) = time(s"bucketed rewrite (${2 * nSmall} delta)") {
      CdcMirror.applyDelta(spark, s"$base/mirror_bucketed", gone3, fetched3)
    }
    delta3.unpersist(); gone3.unpersist(); fetched3.unpersist()
    val bCount = CdcMirror.read(spark, s"$base/mirror_bucketed").count()
    val naiveCount = spark.read.parquet(s"$base/mirror_v3").count()
    require(bCount == naiveCount && bCount == n - nDel + nIns,
      s"bucketed mirror diverged: $bCount vs $naiveCount")

    // The SLOPE demonstration: the bucketed apply carries a flat ~2-3 s
    // of job/commit overhead that masks its advantage when the naive
    // rewrite is also ~3 s, so scale the MIRROR (not the delta) — a
    // synthetic mirror (no collection machinery needed; the rewrite
    // claim is pure storage-layout) at `mirrorN` rows, same 60-key
    // delta. Naive rewrite cost grows with the mirror; the bucketed one
    // must stay ~flat (touched buckets only).
    // default sized to the 8g forked JVM + a half-full /tmp (three 3 GB
    // copies + shuffle live at once); the 1M arm ran at
    // SPARK_DRIVER_MEM=16g with ~25 GB free
    val mirrorN = if (args.length > 3) args(3).toLong else 500000L
    // the collection + first-mirror intermediates are no longer needed —
    // drop them so three synthetic copies fit alongside shuffle spill
    Seq("mirror", "mirror_v2", "mirror_v3", "mirror_bucketed").foreach(p =>
      deleteRec(new java.io.File(s"$base/$p")))
    val mRows = spark.range(mirrorN).select(col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector"))
    time(s"synthetic naive seed ($mirrorN)") {
      mRows.write.mode("overwrite").parquet(s"$base/syn_naive")
    }
    time(s"synthetic bucketed seed ($mirrorN)") {
      CdcMirror.seed(mRows, s"$base/syn_bucketed", "doc_id", numBuckets)
    }
    val sGone = spark.range(nSmall)
      .select((col("id") * (mirrorN / nSmall) + 1L).as("doc_id")).cache()
    val sUps = spark.range(mirrorN, mirrorN + nSmall).select(
      col("id").as("doc_id"),
      genUdf(col("id")).cast("array<double>").as("vector")).cache()
    sGone.count(); sUps.count()
    val (_, tSynNaive) = time(s"synthetic naive rewrite ($mirrorN)") {
      spark.read.parquet(s"$base/syn_naive")
        .join(sGone, Seq("doc_id"), "left_anti").unionByName(sUps)
        .write.mode("overwrite").parquet(s"$base/syn_naive_v2")
    }
    val (sTouched, tSynBucketed) = time(s"synthetic bucketed rewrite ($mirrorN)") {
      CdcMirror.applyDelta(spark, s"$base/syn_bucketed", sGone, sUps)
    }
    sGone.unpersist(); sUps.unpersist()
    val sbCount = CdcMirror.read(spark, s"$base/syn_bucketed").count()
    require(sbCount == mirrorN && sbCount == spark.read.parquet(s"$base/syn_naive_v2").count(),
      s"synthetic mirrors diverged: $sbCount")

    println(s"""{"op":"cdc","n":$n,"delta":${nDel + nIns},""" +
      f""""changes_sec":$tRestricted%.2f,"full_diff_sec":$tFull%.2f,""" +
      f""""mirror_apply_sec":$tApply%.2f,""" +
      f""""small_delta":${2 * nSmall},"naive_small_apply_sec":$tNaiveSmall%.2f,""" +
      f""""bucketed_apply_sec":$tBucketed%.2f,"touched_buckets":${touched.size},""" +
      f""""num_buckets":$numBuckets,"mirror_n":$mirrorN,""" +
      f""""syn_naive_rewrite_sec":$tSynNaive%.2f,""" +
      f""""syn_bucketed_rewrite_sec":$tSynBucketed%.2f,""" +
      s""""syn_touched_buckets":${sTouched.size}}""")
    spark.stop()
    // a successful run leaves nothing behind — the 768-dim intermediates
    // are tens of GB and a few stale runs fill the sandbox disk (a 1M
    // soak died on "No space left" from exactly this); failures keep
    // their dirs for debugging because this line is never reached
    deleteRec(new java.io.File(base))
  }
}
