package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextPipeline}

/** Demo-scale measurement harness for the text-pipeline operators
  * (BASELINE.md): N synthetic documents (~150-250 tokens, Zipf-ish skewed
  * vocabulary, boilerplate planted in 1/11 of docs) through the
  * shuffle-heavy passes — repetition signals, TF-IDF top terms, and
  * MinHash+LSH pair generation — so the 1M-doc numbers sit next to the
  * 1M x 768 vector numbers from `graft.Scale`.
  *
  * `runMain graft.ScaleText [N]` — default 1,000,000.
  */
object ScaleText {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions scale with DATA, not cores (the first 5M-doc
    // run died OOM at 64g: 32 partitions put ~160k docs of substring
    // shingle rows into each sorter, 5x the per-task volume the 1M
    // suite was sized for). ~31k docs per partition reproduces the 1M
    // suite's task size at any n — on a real cluster this is
    // spark.sql.shuffle.partitions sized to the stage's bytes, the
    // thing AQE coalesces DOWN from but never splits UP to.
    val shufflePartitions = math.max(cpus.toInt, n / 31250)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic corpus; generation happens once, outside the
    // timed sections (persisted). 30% of tokens draw from a 1k hot head so
    // df/tf skew resembles natural text; every 11th doc carries a repeated
    // phrase so repetitionSignals has real positives to find; every 13th
    // doc is a one-token-off near-copy of its neighbor so the minhash pair
    // expansion and verify join have real work (jaccard ~0.99).
    val genUdf = udf { (id: Long) =>
      import graft.functions.HashKernels.mix64
      val dup = id % 13 == 12
      val seed = if (dup) id - 1 else id
      val len = 150 + (math.floorMod(mix64(seed), 100L)).toInt
      val sb = new StringBuilder(len * 7)
      var i = 0
      while (i < len) {
        val h = math.abs(mix64(seed * 100003L + i))
        val w = if (h % 10 < 3) h % 1000 else h % 30000
        sb.append('w').append(w).append(' ')
        i += 1
      }
      if (seed % 11 == 0)
        sb.append(Seq.fill(20)("click here to subscribe now").mkString(" "))
      if (dup) sb.append(" changed")
      sb.toString
    }
    val docs = spark.range(n.toLong)
      .select(col("id").as("doc_id"), genUdf(col("id")).as("text"))
      .repartition(cpus.toInt).persist()
    docs.count()

    // optional arg 2: comma-list of ops to run (rep,tfidf,minhash,substr,
    // simhash; default all), and repeat count via e.g. "tfidf*3" — for
    // isolating one op's scaling behavior in a single JVM
    val opSpec = if (args.length > 1) args(1) else "rep,tfidf,minhash,substr,simhash,dsir,pack,budget"
    val opRepeats: Map[String, Int] = opSpec.split(",").map { s =>
      s.split("\\*") match {
        case Array(n, r) => n -> r.toInt
        case Array(n) => n -> 1
      }
    }.toMap
    def timed(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    def timedOp(name: String)(f: => Unit): Double = {
      val reps = opRepeats.getOrElse(name, 0)
      var last = 0.0
      for (i <- 1 to reps) {
        last = timed(f)
        if (reps > 1) println(f"[scaletext] $name run $i: $last%.1f s")
      }
      last
    }

    // aggregate OVER the computed signal columns so column pruning can't
    // skip the work a bare count() would let Catalyst drop
    var repCheck = 0.0
    val repSec = timedOp("rep") {
      repCheck = TextPipeline.repetitionSignals(docs)
        .agg(sum(col("dup_unigram_frac") + col("top_trigram_frac")))
        .head().getDouble(0)
    }

    var tfidfCheck = 0L
    val tfidfSec = timedOp("tfidf") {
      tfidfCheck = TextPipeline.topTermsTfIdf(docs, k = 3)
        .agg(sum(length(col("term"))).cast("long")).head().getLong(0)
    }

    var minhashPairs = 0L
    val minhashSec = timedOp("minhash") {
      minhashPairs = Dedup.minhashPairs(docs, shingleLen = 3, k = 64,
        bands = 16, threshold = 0.7).count()
    }

    // the boilerplate tails (1/11 of docs share a 100-token phrase) and
    // the near-copies are exactly what ExactSubstr must flag
    var substrTokens = 0L
    val substrSec = timedOp("substr") {
      substrTokens = Dedup.substringDupSpans(docs, windowLen = 20)
        .agg(sum(col("dup_tokens"))).head().getLong(0)
    }

    // the 30% hot-head vocab correlates sketches across unrelated docs
    // (0.1% of ALL pairs land within Hamming 3 at 100k docs), so the
    // corpus is exactly the template-heavy shape the hot-bucket guard
    // exists for — run the guarded plan, as a 100-TB job would
    var simhashPairs = 0L
    val simhashSec = timedOp("simhash") {
      simhashPairs = Dedup.simhashPairsFromSketches(
        docs.select(col("doc_id").as("id"),
          graft.functions.GraftFunctions.simhash(
            graft.functions.GraftFunctions.tokenize(col("text"))).as("sk")),
        maxHamming = 3, maxBucket = 8192).count()
    }

    // DSIR end-to-end: hashed-ngram feature build + both distributions +
    // per-doc weights; target = the boilerplate-carrying docs (1/11)
    var dsirCheck = 0.0
    val dsirSec = timedOp("dsir") {
      val bc = TextPipeline.dsirBuckets(docs, buckets = 65536)
      val target = docs.filter(col("doc_id") % 11 === 0).select(col("doc_id").as("id"))
      dsirCheck = TextPipeline.dsirWeightsFromBuckets(bc, target, buckets = 65536)
        .agg(sum(col("log_weight"))).head().getDouble(0)
    }

    // Distributed prefix scans (pack + token budget) — the RangeBuckets
    // family at corpus scale; the persist A/B switch is
    // GRAFT_PREFIX_PERSIST=0 (BASELINE.md records both arms)
    var packCheck = 0L
    val packSec = timedOp("pack") {
      packCheck = TextPipeline.packSequences(docs, contextLen = 2048)
        .agg(max(col("window_end"))).head().getLong(0)
    }
    var budgetKept = 0L
    val budgetSec = timedOp("budget") {
      budgetKept = TextPipeline.tokenBudgetSample(
        docs.withColumn("src", (col("doc_id") % 3).cast("string")),
        strataCol = "src", budgets = Map("0" -> 20000000L),
        defaultBudget = 10000000L).count()
    }

    // Sessionize at corpus scale (restructured round 11 to one full
    // shuffle+sort): 1M events over 10k users PLUS one giant user
    // carrying 20% of all events — the skew shape the prefix-scan
    // construction exists for; a per-user window would serialize it
    var sessCount = 0L
    val sessSec = timedOp("sess") {
      val ev = spark.range(n.toLong).selectExpr(
        "CASE WHEN id % 5 = 0 THEN 0L ELSE 1 + pmod(xxhash64(id), 9999) END AS user_id",
        "(id * 37L) % 100000000000L AS us",
        "id AS event_id")
      sessCount = graft.operators.Sessionize.batch(ev, gapMinutes = 30).count()
    }

    // Streaming sessionize (flatMapGroupsWithState keyed state) over the
    // SAME skewed events, replayed through the q96 harness (staged file
    // stream + per-user sentinels, one micro-batch). The giant user's
    // 200k events go through one group iterator — the state machine's
    // worst case. Timed section = the streaming query only (staging is
    // harness). The session count must equal the batch count: a
    // batch/streaming parity check at corpus scale, not just sf0.01.
    var sessStreamCount = 0L
    val sessStreamSec = timedOp("sess_stream") {
      import spark.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
      val maxUs = 100000000000L
      val ev = spark.range(n.toLong).selectExpr(
        "CASE WHEN id % 5 = 0 THEN 0L ELSE 1 + pmod(xxhash64(id), 9999) END AS userId",
        "(id * 37L) % 100000000000L AS us")
      ev.unionByName(ev.select(col("userId")).distinct()
          .select(col("userId"), lit(maxUs + 31L * 60L * 1000000L).as("us")))
        .write.parquet(s"$base/in")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
        .as[graft.operators.Sessionize.SessionEvent]
      graft.operators.Sessionize.streaming(stream, gapMinutes = 30).toDF()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/ck")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      sessStreamCount = spark.read.parquet(s"$base/out").count()
      require(sessCount == 0L || sessStreamCount == sessCount,
        s"streaming/batch session parity broke: $sessStreamCount vs $sessCount")
    }

    // Boilerplate discovery: the planted "click here to subscribe now"
    // phrase (1/11 of docs) must dominate the top grams
    var ngramTop = 0L
    val ngramSec = timedOp("ngrams") {
      ngramTop = TextPipeline.frequentNgrams(docs, n = 3, minDf = 2, k = 100)
        .agg(sum(col("total"))).head().getLong(0)
    }

    // Conditional bigram NLL: the heaviest statistical pass (distinct-
    // bigram vocabulary is corpus-sized); the bigram-keyed partial agg is
    // the only corpus-sized shuffle
    var bigramCheck = 0.0
    val bigramSec = timedOp("bigram") {
      bigramCheck = TextPipeline.bigramLogProb(docs)
        .agg(sum(col("bigram_nll"))).head().getDouble(0)
    }

    // Incremental exact dedup: admit the odd half as a "new batch" against
    // the even half's hash snapshot (one anti-join, no corpus re-scan)
    var incrSurvivors = 0L
    val incrSec = timedOp("incr") {
      val seen = Dedup.exact(docs.filter(col("doc_id") % 2 === 0))
        .select("content_hash")
      incrSurvivors = Dedup.incrementalExact(
        docs.filter(col("doc_id") % 2 =!= 0), seen).count()
    }

    // Seed NB classifier end-to-end: the boilerplate-carrying docs (1/11)
    // as the trusted seed; vocab-keyed model + term-keyed score join
    var classifyCheck = 0L
    val classifySec = timedOp("classify") {
      val seed = docs.filter(col("doc_id") % 11 === 0).select(col("doc_id"))
      classifyCheck = TextPipeline.seedClassifier(docs, seed)
        .filter(col("keep")).count()
    }

    // BPE fit (256 merges on the corpus word-frequency table) + map-only
    // memoized encode of every document
    var bpeTokens = 0L
    val bpeSec = timedOp("bpe") {
      val model = graft.operators.Bpe.train(docs, numMerges = 256)
      bpeTokens = graft.operators.Bpe.encodeCounts(docs, model)
        .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    }

    // SemDeDup at corpus scale (BASELINE row; not in the default op set):
    // synthetic clustered embeddings — 64 planted directions plus jitter,
    // every 17th doc a near-copy of its predecessor — then the
    // cluster-parallel within-cluster pair scan. The candidate volume is
    // sum over clusters of C(|c|,2) evaluated IN-TASK after one
    // centroid-keyed shuffle of the vectors; only surviving pairs project.
    var semPairs = 0L
    val semSec = timedOp("semdedup") {
      val dim = 64
      val embUdf = udf { (id: Long) =>
        import graft.functions.HashKernels.mix64
        val dup = id % 17 == 16
        val seed = if (dup) id - 1 else id
        val c = math.floorMod(mix64(seed * 31L), 64L).toInt
        Array.tabulate(dim) { d =>
          val j = mix64(seed * 100003L + d).toDouble / Long.MaxValue.toDouble
          val j2 = if (dup) mix64(id * 7919L + d).toDouble / Long.MaxValue.toDouble else 0.0
          (if (math.floorMod(c + d, 64) < 4) 4.0 else 0.0) + 0.05 * j + 0.002 * j2
        }
      }
      val emb = spark.range(n.toLong)
        .select(col("id").as("vec_id"), embUdf(col("id")).as("embedding"))
        .repartition(cpus.toInt).persist()
      emb.count()
      semPairs = Dedup.semanticDedupPairs(emb, numCentroids = 4096,
        threshold = 0.99).count()
      emb.unpersist(blocking = false)
    }

    def dps(sec: Double): Double = if (sec > 0) n / sec else 0.0
    println(s"""{"n":$n,"rep_sec":${f"$repSec%.1f"},""" +
      s""""rep_docs_per_sec":${f"${dps(repSec)}%.0f"},"rep_check":${f"$repCheck%.1f"},""" +
      s""""tfidf_sec":${f"$tfidfSec%.1f"},"tfidf_docs_per_sec":${f"${dps(tfidfSec)}%.0f"},""" +
      s""""tfidf_check":$tfidfCheck,"minhash_sec":${f"$minhashSec%.1f"},""" +
      s""""minhash_docs_per_sec":${f"${dps(minhashSec)}%.0f"},""" +
      s""""minhash_pairs":$minhashPairs,""" +
      s""""substr_sec":${f"$substrSec%.1f"},""" +
      s""""substr_docs_per_sec":${f"${dps(substrSec)}%.0f"},""" +
      s""""substr_dup_tokens":$substrTokens,""" +
      s""""simhash_sec":${f"$simhashSec%.1f"},"simhash_pairs":$simhashPairs,""" +
      s""""dsir_sec":${f"$dsirSec%.1f"},"dsir_docs_per_sec":${f"${dps(dsirSec)}%.0f"},""" +
      s""""dsir_check":${f"$dsirCheck%.1f"},""" +
      s""""semdedup_sec":${f"$semSec%.1f"},"semdedup_docs_per_sec":${f"${dps(semSec)}%.0f"},""" +
      s""""semdedup_pairs":$semPairs,""" +
      s""""ngrams_sec":${f"$ngramSec%.1f"},"ngrams_docs_per_sec":${f"${dps(ngramSec)}%.0f"},""" +
      s""""ngrams_top_total":$ngramTop,""" +
      s""""bigram_sec":${f"$bigramSec%.1f"},"bigram_docs_per_sec":${f"${dps(bigramSec)}%.0f"},""" +
      s""""bigram_check":${f"$bigramCheck%.1f"},""" +
      s""""incr_sec":${f"$incrSec%.1f"},"incr_docs_per_sec":${f"${dps(incrSec)}%.0f"},""" +
      s""""incr_survivors":$incrSurvivors,""" +
      s""""classify_sec":${f"$classifySec%.1f"},""" +
      s""""classify_docs_per_sec":${f"${dps(classifySec)}%.0f"},""" +
      s""""classify_kept":$classifyCheck,""" +
      s""""bpe_sec":${f"$bpeSec%.1f"},"bpe_docs_per_sec":${f"${dps(bpeSec)}%.0f"},""" +
      s""""bpe_tokens":$bpeTokens,""" +
      s""""pack_sec":${f"$packSec%.1f"},"pack_docs_per_sec":${f"${dps(packSec)}%.0f"},""" +
      s""""pack_check":$packCheck,""" +
      s""""budget_sec":${f"$budgetSec%.1f"},"budget_kept":$budgetKept,""" +
      s""""sess_sec":${f"$sessSec%.1f"},"sess_sessions":$sessCount,""" +
      s""""sess_stream_sec":${f"$sessStreamSec%.1f"},""" +
      s""""sess_stream_sessions":$sessStreamCount}""")
    spark.stop()
  }
}
