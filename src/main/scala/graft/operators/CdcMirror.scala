package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-bucketed downstream mirror for CDC consumers (round-12 verdict
  * #2). A consumer following [[graft.core.Collection.changes]] gets an
  * O(delta) diff and an O(delta) payload fetch
  * ([[graft.core.Snapshot.liveRowsFor]]), but a NAIVE parquet mirror
  * still pays O(mirror) to rewrite itself on every apply (~9 s of 11.5 s
  * at 200k×768 in ScaleCdc) — the storage format floor, not operator
  * cost. This operator removes that floor the way Delta/Iceberg
  * copy-on-write tables do, at bucket granularity:
  *
  *   - the mirror lives as a hash-partitioned parquet table
  *     `data/bucket=<pmod(xxhash64(key), numBuckets)>/...`;
  *   - an apply computes the touched bucket set from the DELTA keys
  *     (bounded by numBuckets — a driver-safe collect), reads ONLY those
  *     buckets (partition-pruned scan), anti-joins the gone keys, unions
  *     the fetched upserts, and rewrites ONLY those bucket directories
  *     (staged write + per-bucket swap);
  *   - untouched buckets are never read and never rewritten, so apply
  *     cost tracks `|delta| + touchedBuckets × bucketSize`, not the
  *     corpus.
  *
  * At 100 TB, size `numBuckets` so a bucket is a few
  * `maxPartitionBytes` (e.g. 1 GiB of vectors → one task rewrites it);
  * a delta touching 0.1% of keys then rewrites ≤ 0.1%×numBuckets
  * buckets in one job whose tasks are all bucket-local. Bucket-granular
  * copy-on-write is chosen over row-level merge-on-read deliberately:
  * reads stay plain partition-pruned parquet scans with zero merge work
  * (the hot path for an analytics mirror), and the write amplification
  * is bounded by bucket size, which the caller controls.
  *
  * Reference anchor: this is the consumer side of the reference's WAL
  * shipping (rs/index_server mirrors state segment-by-segment); the
  * bucketed layout is the Spark-native equivalent of its per-shard
  * incremental apply. */
object CdcMirror {

  private def metaPath(path: String) =
    java.nio.file.Paths.get(path, "MIRROR_META")

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) {
      val cs = f.listFiles()
      if (cs != null) cs.foreach(c => deleteRecursively(c.toPath))
    }
    f.delete()
  }

  private def bucketOf(keyCol: String, numBuckets: Int): Column =
    pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")

  /** Materialize `df` (must contain `keyCol`; one row per key) as a new
    * bucketed mirror at `path`, replacing anything there. The payload
    * schema is pinned in the metadata so a mirror whose buckets have all
    * emptied still reads back as an empty frame of the right shape. */
  def seed(df: DataFrame, path: String, keyCol: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, s"numBuckets=$numBuckets")
    require(df.columns.contains(keyCol), s"missing key column $keyCol")
    deleteRecursively(java.nio.file.Paths.get(path))
    // repartition BY BUCKET before the partitioned write: without it every
    // task holds rows of ~every bucket and writes one tiny file per
    // (task, bucket) — thousands of near-empty files. With it each bucket
    // is one task's contiguous rows -> one file per bucket.
    df.withColumn("bucket", bucketOf(keyCol, numBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/data")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(metaPath(path),
      s"$keyCol\n$numBuckets\n${df.schema.toDDL}\n")
  }

  /** The mirror's current contents (bucket column stripped). Plain
    * partition-pruned parquet — pushing a key predicate through this
    * frame prunes to one bucket. */
  def read(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path).drop("bucket")

  /** The mirror WITH its `bucket` partition column, schema pinned from
    * the metadata (no inference — an all-empty mirror still resolves). */
  private def readRaw(spark: SparkSession, path: String): DataFrame = {
    val (_, _, ddl) = meta(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      .add("bucket", org.apache.spark.sql.types.IntegerType)
    spark.read.schema(schema).parquet(s"$path/data")
  }

  private def meta(path: String): (String, Int, String) = {
    val lines = java.nio.file.Files.readString(metaPath(path)).split("\n")
    (lines(0), lines(1).trim.toInt, lines(2))
  }

  /** Apply one CDC delta: drop `goneKeys` (deletes + update keys, one
    * column = the mirror key), add `upserts` (full mirror-schema rows for
    * inserts + updates — the [[graft.core.Snapshot.liveRowsFor]] fetch).
    * Only buckets containing a delta key are read and rewritten; a
    * touched bucket whose rows all vanish is removed. Returns the touched
    * bucket ids (the unit the cost tracks). */
  def applyDelta(spark: SparkSession, path: String,
      goneKeys: DataFrame, upserts: DataFrame): Seq[Int] = {
    val (keyCol, numBuckets, _) = meta(path)
    val b = bucketOf(keyCol, numBuckets)
    // touched buckets: bounded by numBuckets, so the collect is driver-
    // safe by construction (the delta KEY set may be large; its bucket
    // projection may not)
    val touched = goneKeys.select(b.as("bucket"))
      .union(upserts.select(b.as("bucket")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil
    // read ONLY the touched bucket directories, listed explicitly — at a
    // large numBuckets, partition discovery over every bucket dir costs
    // more than the touched data itself (basePath keeps the bucket
    // partition column derivable, schema comes from the metadata)
    val (_, _, ddl) = meta(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val touchedPaths = touched.map(bk => s"$path/data/bucket=$bk")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    val old =
      if (touchedPaths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .option("basePath", s"$path/data")
        .parquet(touchedPaths: _*)
        .drop("bucket")
    val updated = old
      .join(goneKeys.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      .unionByName(upserts)
      .withColumn("bucket", b)
    // Stage-and-swap: the rewritten buckets land in a staging dir (Spark
    // refuses an overwrite of a path it is reading), then each touched
    // bucket directory is swapped into place with a local rename — the
    // same commit shape as a table format swapping data files under a
    // manifest. A touched bucket that produced zero rows (all its keys
    // deleted) simply has no staged dir and is removed. Single-writer
    // semantics, like the consumer loop that owns the mirror.
    val stage = s"$path/.stage_apply"
    deleteRecursively(java.nio.file.Paths.get(stage))
    // No repartition here, unlike seed: the surviving old rows are ALREADY
    // bucket-aligned (each input task holds one bucket's file), so the
    // partitioned write emits ~1 file per bucket from them plus a small
    // file per bucket holding that bucket's upserts — bounded at ~2 files
    // per touched bucket (re-merged on the next rewrite of that bucket),
    // and the touched payload never pays a shuffle.
    updated.write.mode("overwrite").partitionBy("bucket").parquet(stage)
    touched.foreach { bk =>
      val src = java.nio.file.Paths.get(stage, s"bucket=$bk")
      val dst = java.nio.file.Paths.get(s"$path/data", s"bucket=$bk")
      deleteRecursively(dst)
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.move(src, dst)
    }
    deleteRecursively(java.nio.file.Paths.get(stage))
    touched
  }
}
