package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  * All are pure DataFrame pipelines: candidate generation is always a
  * bucket join (never an O(n^2) crossJoin), so each scales to 100 TB by
  * partitioning on the bucket key.
  */
object Dedup {

  /** Exact dedup by content hash (hash-groupBy): one row per distinct
    * normalized text, keeping the smallest id; `dup_count` = group size.
    * Whitespace/case-normalized so trivially-reformatted copies collapse. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", md5(concat_ws(" ", tokenize(col(textCol)))))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash+LSH near-duplicate pairs: shingle -> minhash signature ->
    * band keys -> bucket self-join -> signature-estimated Jaccard filter.
    * Returns `[a, b, est_jaccard]` with a < b.
    *
    * Scale: the only shuffle is the explode+groupBy on band keys; each
    * bucket is tiny for honest thresholds. `bands * rowsPerBand = k`. */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val sigs = docs.select(
      col(idCol).as("id"),
      minhash_signature(shingle_hashes(tokenize(col(textCol)), shingleLen), k).as("sig"))
    // Bucket join on (id, band) only; signatures re-attached to the (much
    // smaller) deduped candidate set afterwards instead of riding the
    // band shuffle.
    val banded = sigs
      .select(col("id"), explode(lsh_band_keys(col("sig"), bands, rows)).as("band"))
    val a = banded.select(col("band"), col("id").as("a"))
    val b = banded.select(col("band"), col("id").as("b"))
    a.join(b, Seq("band"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .dropDuplicates("a", "b")
      .join(sigs.select(col("id").as("a"), col("sig").as("sig_a")), Seq("a"))
      .join(sigs.select(col("id").as("b"), col("sig").as("sig_b")), Seq("b"))
      .withColumn("est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("a", "b", "est_jaccard")
  }

  /** SimHash near-dup pairs: 64-bit sketch, banded into four 16-bit chunks
    * (any pair within Hamming distance 3 shares at least one exact chunk),
    * bucket join, exact Hamming verify. Returns `[a, b, hamming]`. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val sk = docs.select(col(idCol).as("id"), simhash(tokenize(col(textCol))).as("sk"))
    val banded = sk.select(col("id"), col("sk"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"), shiftrightunsigned(col("sk"), i * 16)
          .bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("b"))
      .select(col("id"), col("sk"), col("b.chunk"), col("b.key"))
    val l = banded.select(col("chunk"), col("key"), col("id").as("a"), col("sk").as("sk_a"))
    val r = banded.select(col("chunk"), col("key"), col("id").as("b"), col("sk").as("sk_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sk_a", "sk_b")
      .dropDuplicates("a", "b")
      .withColumn("hamming", hamming64(col("sk_a"), col("sk_b")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** Exact n-gram Jaccard pairs: candidates share at least one shingle
    * (inverted-index join on rare shingles), then exact Jaccard over the
    * distinct shingle sets. Returns `[a, b, jaccard]`.
    *
    * `maxShinglePostings` drops ubiquitous shingles from candidate
    * generation (they only add candidates, never change the verdict of the
    * exact verify) — the standard scale guard against hot keys. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleLen: Int = 3,
      threshold: Double = 0.5,
      maxShinglePostings: Int = 1000): DataFrame = {
    val sets = docs.select(
      col(idCol).as("id"),
      array_distinct(shingle_hashes(tokenize(col(textCol)), shingleLen)).as("shingles"))
    val posting = sets.select(col("id"), explode(col("shingles")).as("sh"))
    val rare = posting.groupBy("sh").count().filter(col("count") <= maxShinglePostings)
    val pruned = posting.join(rare.select("sh"), Seq("sh"), "left_semi")
    // |A ∩ B| falls straight out of the posting join as a pair count — no
    // need to ship the shingle arrays through the shuffle; with set sizes
    // joined in afterwards, J = c / (|A| + |B| - c) exactly.
    // Dropped shingles (> maxShinglePostings) shrink the computed overlap,
    // never grow it — the guard trades recall on pathological hot keys.
    val coCounts = pruned.select(col("sh"), col("id").as("a"))
      .join(pruned.select(col("sh"), col("id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val sizes = sets.select(col("id"), size(col("shingles")).as("n"))
    coCounts
      .join(sizes.select(col("id").as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Embedding near-duplicate pairs by cosine similarity.
    *
    * Candidate generation: sign-bit LSH — project each embedding onto
    * `nPlanes` seeded pseudo-random hyperplanes (deterministic hash-mixed
    * coefficients), bucket on the sign bitmask; near-identical vectors
    * collide. Verify with exact cosine. Brute-force variant below is the
    * oracle. Returns `[a, b, cosine]`. */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.95,
      nPlanes: Int = 8,
      nTables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(size(col(vecCol))).as[Int].head()
    // nTables independent sign-bit sketches of nPlanes each; a pair is a
    // candidate if it collides in ANY table (standard multi-table LSH
    // recall amplification: p_collide = 1-(1-c^planes)^tables).
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables) { t =>
      Array.tabulate(nPlanes) { p =>
        Array.tabulate(dim) { d =>
          val h = graft.functions.HashKernels.mix64(seed + (t * 8209L + p) * 131071L + d)
          h.toDouble / Long.MaxValue.toDouble
        }
      }
    }
    val bc = spark.sparkContext.broadcast(planes)
    val sketchUdf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val ts = bc.value
      Array.tabulate(ts.length) { t =>
        var mask = 0L
        var p = 0
        while (p < ts(t).length) {
          var dot = 0.0; var i = 0
          val pl = ts(t)(p)
          while (i < arr.length && i < pl.length) { dot += arr(i) * pl(i); i += 1 }
          if (dot >= 0) mask |= (1L << p)
          p += 1
        }
        (t.toLong << 32) | mask // table id disambiguates buckets
      }
    }
    val sk = embeddings.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", explode(sketchUdf(col("v"))))
    val l = sk.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val r = sk.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b", "va", "vb")
      .dropDuplicates("a", "b")
      .withColumn("cosine", cosine_similarity(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** Collapse a near-duplicate pair graph `[a, b]` into duplicate groups
    * via distributed connected components (iterative min-label
    * propagation — Spark-idiomatic label prop, converges in
    * O(log(diameter)) rounds; near-dup clusters are shallow so `maxIters`
    * of 10 is ample). Returns `[id, keep_id]` for every id that appears
    * in a pair, with keep_id = the smallest id of its component: drop
    * rows where id != keep_id for a canonical dedup. */
  def keepList(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val edges = pairs.select(col("a").cast("long"), col("b").cast("long"))
    // undirected adjacency incl. self-loops so isolated members keep labels
    val adj = edges.select(col("a").as("id"), col("b").as("nb"))
      .union(edges.select(col("b").as("id"), col("a").as("nb")))
      .union(edges.select(col("a").as("id"), col("a").as("nb")))
      .union(edges.select(col("b").as("id"), col("b").as("nb")))
      .distinct()
      .persist()
    var labels = adj.groupBy("id").agg(min(col("nb")).as("label"))
    var cached: List[DataFrame] = Nil
    var iter = 0
    var changed = 1L
    while (iter < maxIters && changed > 0) {
      val next = adj.join(labels.withColumnRenamed("id", "nb"), Seq("nb"))
        .groupBy("id").agg(min(col("label")).as("next_label"))
      val joined = labels.join(next, Seq("id"))
        .select(col("id"), least(col("label"), col("next_label")).as("next_label"),
          col("label"))
        .persist()
      cached ::= joined
      changed = joined.filter(col("next_label") < col("label")).count()
      labels = joined.select(col("id"), col("next_label").as("label"))
      iter += 1
    }
    // materialize the final labels, then release every iteration cache
    val out = labels.select(col("id"), col("label").as("keep_id")).persist()
    out.count()
    cached.foreach(_.unpersist(blocking = false))
    adj.unpersist(blocking = false)
    out
  }

  /** Exact (brute-force) cosine pair scan — O(n^2), oracle for the LSH
    * variant; only for tests/small inputs. */
  def embeddingNearDupExact(
      embeddings: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95): DataFrame = {
    val v = embeddings.select(col(idCol).as("a"), col(vecCol).cast("array<double>").as("va"))
    val w = embeddings.select(col(idCol).as("b"), col(vecCol).cast("array<double>").as("vb"))
    v.crossJoin(w).filter(col("a") < col("b"))
      .withColumn("cosine", cosine_similarity(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
