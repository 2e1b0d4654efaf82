package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextPipeline}

/** End-to-end curation pipeline: the operators composed the way a real
  * training-data job chains them — quality filter → exact dedup →
  * near-dup collapse → token budget → sequence packing — with planted
  * junk, exact copies, and near-copies verified to fall out at the right
  * stage. Each stage's output feeds the next as a DataFrame (one logical
  * plan family, no materialization between stages required). */
class PipelineE2ESpec extends SparkSuite {
  import spark.implicits._

  test("quality -> exact dedup -> near-dup collapse -> budget -> pack") {
    // per-doc disjoint vocabulary so the only near-dup pair is the planted one
    def fluent(seed: Int): String =
      (0 until 25).map(i => s"word${seed}q${i}x").mkString(" ")
    val docs = (
      (0 until 20).map(i => (i.toLong, fluent(i))) ++            // normal corpus
        Seq((100L, fluent(0)),                                   // exact dup of 0
          (101L, " " + fluent(0).toUpperCase + " ")) ++          // normalized dup of 0
        Seq((110L, fluent(1).replaceFirst("x ", "x CHANGED "))) ++ // near-dup of 1
        Seq((120L, "too short"),                                 // junk: word count
          (121L, (("#!" * 3) + " ") * 20))                       // junk: symbol ratio
      ).toDF("doc_id", "text")

    // stage 1: quality — junk out, everything else (incl. dups) through
    val keep = TextPipeline.gopherQualityFilter(docs, minWords = 10)
      .filter(col("keep")).select(col("id").as("doc_id"))
    val kept = keep.as[Long].collect().toSet
    assert(!kept.contains(120L) && !kept.contains(121L), s"junk survived: $kept")
    assert((0L until 20L).forall(kept.contains) && kept.contains(110L) &&
      kept.contains(100L) && kept.contains(101L))
    val clean = docs.join(keep, Seq("doc_id"))

    // stage 2: exact dedup — 100/101 collapse into 0
    val exact = Dedup.exact(clean)
    val exactKeep = exact.select("keep_id").as[Long].collect().toSet
    assert(exactKeep.contains(0L) && !exactKeep.contains(100L) && !exactKeep.contains(101L))
    assert(exactKeep.size === 21) // 20 normal + near-dup 110
    val exactDocs = clean.join(exact.select(col("keep_id").as("doc_id")), Seq("doc_id"))

    // stage 3: near-dup collapse — (1, 110) is the only surviving pair
    val pairs = Dedup.minhashPairs(exactDocs, shingleLen = 2, k = 64,
      bands = 32, threshold = 0.5)
    val mapped = Dedup.keepList(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapped.getOrElse(110L, 110L) === 1L, s"near-dup not collapsed: $mapped")
    val dropIds = mapped.collect { case (id, canon) if id != canon => id }.toSet
    assert(dropIds === Set(110L), s"unexpected near-dup drops: $dropIds")
    val deduped = exactDocs.filter(!col("doc_id").isin(dropIds.toSeq: _*))
    assert(deduped.count() === 20)

    // stage 4: token budget — deterministic greedy fill caps the stratum
    val budgetRows = TextPipeline.tokenBudgetSample(
      deduped.withColumn("stratum", lit("web")), "stratum",
      budgets = Map("web" -> 250L), defaultBudget = 0L)
    val totalTaken = budgetRows.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(totalTaken === 250L, s"budget not exactly filled: $totalTaken") // 10 docs x 25 tokens
    val budgeted = deduped.join(budgetRows.select(col("id").as("doc_id")), Seq("doc_id"))

    // stage 5: packing — contiguous spans, window math consistent
    val packed = TextPipeline.packSequences(budgeted, contextLen = 64)
    val rows = packed.orderBy("doc_id").collect()
    assert(rows.length === 10)
    val total = rows.map(r => r.getAs[Long]("n_tokens")).sum
    assert(total === 250L)
    // spans tile [0, total) in doc_id order
    val starts = rows.map(r => r.getAs[Long]("start_token"))
    assert(starts.head === 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("start_token") + a.getAs[Long]("n_tokens") ===
        b.getAs[Long]("start_token"))
    }
    assert(rows.last.getAs[Long]("window_end") === (total - 1) / 64)
  }

  test("classifier -> calibration -> normalized dedup -> mixture -> BPE -> span corruption") {
    import graft.functions.GraftFunctions.{normalize_text, span_corrupt, tokenize}
    import graft.operators.Bpe
    // seed class draws from a "clean" vocabulary, junk from a disjoint one
    def cleanDoc(seed: Int): String =
      (0 until 30).map(i => s"info${(seed * 3 + i) % 40}").mkString(" ")
    def junkDoc(seed: Int): String =
      (0 until 30).map(i => s"spam${(seed * 5 + i) % 40}").mkString(" ")
    val docs = (
      (0 until 15).map(i => (i.toLong, "wiki", cleanDoc(i))) ++       // trusted seed
        (20 until 30).map(i => (i.toLong, "crawl", cleanDoc(i))) ++   // seed-like crawl
        (40 until 50).map(i => (i.toLong, "crawl", junkDoc(i))) ++    // junk crawl
        Seq((60L, "crawl", "  " + cleanDoc(20).toUpperCase + "  "))   // normalized dup of 20
      ).toDF("doc_id", "source", "text")

    // stage 1: NB classifier with the wiki docs as the trusted seed
    val seed = docs.filter(col("source") === "wiki").select(col("doc_id"))
    val scored = TextPipeline.seedClassifier(docs, seed)
      .withColumnRenamed("id", "doc_id")
    val kept = scored.filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert((20L until 30L).forall(kept.contains), "seed-like crawl docs must pass")
    assert((40L until 50L).forall(id => !kept.contains(id)), "junk crawl docs must fail")

    // stage 2: per-source threshold calibration over the scores exists
    // and orders sanely (crawl quartiles straddle the two planted classes)
    val cal = TextPipeline.calibrateThresholds(
      scored.join(docs.select("doc_id", "source"), Seq("doc_id"))
        .select(col("source"), col("score")), "source", "score")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    assert(cal("crawl")._1 < 0 && cal("crawl")._2 > 0,
      s"crawl p25/p75 should straddle 0: ${cal("crawl")}")

    // stage 3: exact dedup keyed on the normalization kernel collapses 60 into 20
    val surviving = docs.join(scored.filter(col("keep")).select("doc_id"), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nh")).orderBy(col("doc_id").asc)
    val deduped = surviving
      .withColumn("nh", md5(normalize_text(col("text"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("nh", "rk")
    val dedupIds = deduped.select("doc_id").as[Long].collect().toSet
    assert(dedupIds.contains(20L) && !dedupIds.contains(60L),
      s"normalized dup must collapse: $dedupIds")

    // stage 4: mixture weights over the survivors sum to 1
    val mw = TextPipeline.mixtureWeights(deduped, alpha = 0.5, budget = 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(mw.values.sum - 1.0) < 1e-6 && mw.keySet === Set("wiki", "crawl"))

    // stage 5: BPE fit on the surviving corpus; subword count per doc is
    // bounded by character count and at least the word count
    val model = Bpe.train(deduped, numMerges = 32)
    val counts = Bpe.encodeCounts(deduped, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    counts.foreach { case (id, ws, bpe) =>
      assert(bpe >= ws, s"doc $id: fewer subwords than words")
    }

    // stage 6: span corruption over the survivors reconstructs exactly
    val sc = deduped
      .select(col("doc_id"), col("text"),
        span_corrupt(tokenize(col("text")), col("doc_id")).as("sc"))
      .select(col("doc_id"), col("text"), col("sc.input"), col("sc.target"))
      .collect()
    assert(sc.length === dedupIds.size)
    sc.foreach { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
      val spans = collection.mutable.Map.empty[String, Seq[String]]
      var cur: String = null
      val buf = collection.mutable.ArrayBuffer.empty[String]
      r.getString(3).split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          if (cur != null) spans(cur) = buf.toSeq
          cur = t; buf.clear()
        } else buf += t
      }
      if (cur != null) spans(cur) = buf.toSeq
      val rebuilt = r.getString(2).split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
      }
      assert(rebuilt.toSeq === toks.toSeq, s"doc ${r.getLong(0)} reconstruction")
    }
  }
}
