package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, TextPipeline}

/** Decontamination, TF-IDF profiling, and deterministic stratified
  * sampling — the round-4 training-data pipeline additions. */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  test("frequentNgrams: hand-computed totals, df threshold, short docs gram-free") {
    val docs = Seq(
      (0L, "click here to subscribe now"),
      (1L, "breaking news click here to subscribe today"),
      (2L, "click here to unsubscribe"),
      (3L, "to subscribe"), // 2 tokens < n=3: contributes no grams
      (4L, "click here to subscribe click here to subscribe") // gram twice in one doc
    ).toDF("doc_id", "text")
    val got = TextPipeline.frequentNgrams(docs, n = 3, minDf = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGram = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byGram("click here to") === (5L, 4L))   // docs 0,1,2,4 (4 has it twice)
    assert(byGram("here to subscribe") === (4L, 3L))
    assert(!byGram.contains("breaking news click")) // df 1 < minDf
    // ordering: total desc, gram asc
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    val top = got.filter(_._2 == got.head._2).map(_._1)
    assert(top.toSeq === top.sorted.toSeq)
  }

  test("capPerGroup: keeps top-cap per group by score desc, id-asc ties, matches window") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) "even" else "odd", (i % 7).toInt)
    }.toDF("doc_id", "source", "n_chars")
    val got = TextPipeline.capPerGroup(docs, "source", "doc_id", col("n_chars"), cap = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.count(_._1 == "even") === 5 && got.count(_._1 == "odd") === 5)
    // reference: rank window over the same frame
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)
    val ref = docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("source"), col("doc_id"), col("n_chars").cast("double"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.sortBy(t => (t._1, t._4)).toSeq === ref.sortBy(t => (t._1, t._4)).toSeq)
  }

  test("bigramLogProbFromCounts: held-out scoring with unseen-bigram floor") {
    val corpus = Seq((0L, "a b a b"), (1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val lm = TextPipeline.bigramCounts(corpus)
    // parity: scoring the corpus against its own LM == the fused operator
    val fused = TextPipeline.bigramLogProb(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val split = TextPipeline.bigramLogProbFromCounts(corpus, lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fused === split)
    // held-out doc with one seen and one never-seen bigram: "a b" uses the
    // corpus counts (P = 3.5/4.0 with V=2 vocab {a,b}); "b c" has prefix
    // c1p(b)=2 but c2=0 -> floor P = 0.5/3
    val held = Seq((9L, "a b c")).toDF("doc_id", "text")
    val got = TextPipeline.bigramLogProbFromCounts(held, lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    val expected = (-math.log(3.5 / 4.0) + -math.log(0.5 / 3.0)) / 2
    assert(got._1 === 9L && got._2 === 2L)
    assert(math.abs(got._3 - math.rint(expected * 1e4) / 1e4) < 1e-9)
  }

  test("bm25TopK: two-term doc outranks one-term; rare term outweighs common; misses absent") {
    val docs = Seq(
      (0L, "merge join fast table"),        // both query terms
      (1L, "merge table scan row"),         // common term only
      (2L, "join vector"),                  // rarer terms, short doc
      (3L, "merge merge merge merge"),      // tf saturation: still one term
      (4L, "scan row table window")         // no query terms -> absent
    ).toDF("doc_id", "text")
    val got = TextPipeline.bm25TopK(docs, Seq("merge", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(!byId.contains(4L))
    assert(byId(0L)._3 === 2L && byId(1L)._3 === 1L && byId(3L)._3 === 1L)
    // both-terms doc ranks first; tf saturation keeps the merge-spam doc
    // from beating it
    assert(got.head._1 === 0L)
    assert(byId(0L)._2 > byId(3L)._2 && byId(0L)._2 > byId(1L)._2)
    // scores are positive and rounded to 4
    assert(got.forall(t => t._2 > 0 && t._2 === math.rint(t._2 * 1e4) / 1e4))
  }

  test("moreLikeThis: profile picks the seed's distinctive terms; seed excluded; determinism") {
    val docs = Seq(
      (0L, "vector index probe vector quantize"), // the seed
      (1L, "vector index scan"),                  // shares 2 profile terms
      (2L, "vector probe"),                       // shares 2
      (3L, "quantize codes vector"),              // shares 2
      (4L, "table scan row window"),              // shares none -> absent
      (5L, "the the the the")                     // shares none -> absent
    ).toDF("doc_id", "text")
    val got = TextPipeline.moreLikeThis(docs, seedId = 0L, m = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val ids = got.map(_._1)
    // the seed never returns itself; unrelated docs absent
    assert(!ids.contains(0L) && !ids.contains(4L) && !ids.contains(5L))
    assert(ids.toSet === Set(1L, 2L, 3L))
    // profile = seed's top-3 tf-idf terms (vector tf=2 + two of
    // {index, probe, quantize} by term-asc tiebreak at equal tf/df) —
    // every returned doc matched at least one, scores rounded to 4
    assert(got.forall(t => t._3 >= 1L && t._2 > 0 &&
      t._2 === math.rint(t._2 * 1e4) / 1e4))
    // deterministic end to end (two runs, fresh plans)
    val again = TextPipeline.moreLikeThis(docs, seedId = 0L, m = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === again.toSeq)
    // a missing seed fails loudly
    val e = intercept[IllegalArgumentException] {
      TextPipeline.moreLikeThis(docs, seedId = 99L, m = 3, k = 10) }
    assert(e.getMessage.contains("no terms"))
    // bm25TopK exclusion drops ONLY the excluded id (stats unchanged:
    // the remaining scores equal the unexcluded run's)
    val full = TextPipeline.bm25TopK(docs, Seq("vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val excl = TextPipeline.bm25TopK(docs, Seq("vector"), k = 10,
      exclude = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(excl === full.filterNot(_._1 == 0L))
  }

  test("calibrateThresholds: hand-computed interpolated quartiles per group") {
    val scored = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("en", _)) ++
      Seq(10.0, 20.0).map(("fr", _))).toDF("lang", "quality")
    val got = TextPipeline.calibrateThresholds(scored, "lang", "quality")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("en") === ((5L, 2.0, 3.0, 4.0)))       // rank q*(n-1) lands on values
    assert(got("fr") === ((2L, 12.5, 15.0, 17.5)))    // interpolated between the two
  }

  test("bigramLogProb: hand-computed add-alpha conditional scores") {
    val docs = Seq(
      (0L, "a b a b"), (1L, "a b"), (2L, "b a"), (3L, "solo")
    ).toDF("doc_id", "text")
    // corpus: c("a b")=3, c("b a")=2; prefixes c1p(a)=3, c1p(b)=2; V=3
    // (a, b, solo); alpha=0.5:
    //   P(b|a) = 3.5/4.5, P(a|b) = 2.5/3.5
    val pba = 3.5 / 4.5
    val pab = 2.5 / 3.5
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val got = TextPipeline.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L) === ((3L, r4((2 * -math.log(pba) + -math.log(pab)) / 3))))
    assert(got(1L) === ((1L, r4(-math.log(pba)))))
    assert(got(2L) === ((1L, r4(-math.log(pab)))))
    assert(!got.contains(3L)) // single-token doc has no bigrams
    // the fluency signal: a shuffled-token doc scores higher than fluent
    // text with the same unigram bag
    val corpus = (0L until 50L).map(i => (i, "the cat sat on the mat")) :+
      (99L, "mat the on sat cat the")
    val scored = TextPipeline.bigramLogProb(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(99L) > scored(0L))
  }

  test("decontamination flags exactly the docs sharing enough shingles") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta oops different tail here"), // 5 shared 3-grams
      (1L, "alpha beta gamma nothing else in common at all"), // 1 shared 3-gram
      (2L, "completely disjoint text about spark executors and shuffles")
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapReport(train, bench, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 4L, 1L))) // "alpha..zeta" = 6 toks -> 4 shared 3-grams
    val cleaned = Decontaminate.clean(train, bench, minOverlap = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(cleaned.toSeq === Seq(1L, 2L))
  }

  test("decontamination bench-side hot-shingle guard drops ubiquitous n-grams") {
    val bench = Seq(
      (100L, "common boiler plate text one"),
      (101L, "common boiler plate text two"),
      (102L, "common boiler plate text three")
    ).toDF("doc_id", "text")
    val train = Seq((0L, "common boiler plate text zero")).toDF("doc_id", "text")
    // every shared shingle sits in all 3 bench docs; cap at 2 removes them all
    val flagged = Decontaminate.overlapReport(train, bench,
      minOverlap = 1, maxShinglePostings = 2).count()
    assert(flagged === 0L)
    val unguarded = Decontaminate.overlapReport(train, bench,
      minOverlap = 1, maxShinglePostings = 0).count()
    assert(unguarded === 1L)
  }

  test("repetition signals: planted boilerplate scores high, varied text low") {
    val docs = Seq(
      (0L, "spam spam spam spam"), // 4 toks: dup_uni 3/4; 3 bigrams all "spam spam"
      (1L, "one two three four five"), // all distinct
      (2L, "ab cd ab cd ab cd"), // bigram "ab cd" x3 of 5; trigrams alternate
      (3L, "x"), // too short for bigrams -> 0 by convention
      (4L, "") // no tokens at all -> all 0
    ).toDF("doc_id", "text")
    val got = TextPipeline.repetitionSignals(docs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got(0) === ((0L, 0.75, 0.6667, 0.5, 1.0, 1.0)))
    assert(got(1) === ((1L, 0.0, 0.0, 0.0, 0.25, 0.3333)))
    assert(got(2) === ((2L, 0.6667, 0.6, 0.5, 0.6, 0.5)))
    assert(got(3) === ((3L, 0.0, 0.0, 0.0, 0.0, 0.0)))
    assert(got(4) === ((4L, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("pii redaction: emails, phones, ipv4 replaced with typed tokens") {
    val docs = Seq(
      (0L, "contact john.doe+x@example.co.uk or call 555-123-4567 now"),
      (1L, "server at 192.168.1.100 and +1 555 123 4567"),
      (2L, "(555) 123-4567 then 10.0.0.1 and a@b.io"),
      (3L, "no pii here just words 1234 5.6")
    ).toDF("doc_id", "text")
    val got = TextPipeline.redactPii(docs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // expectations replayed verbatim from the DuckDB oracle chain
    assert(got(0) === ((0L, "contact <EMAIL> or call <PHONE> now", 1L, 1L, 0L)))
    assert(got(1) === ((1L, "server at <IP> and <PHONE>", 0L, 1L, 1L)))
    assert(got(2) === ((2L, "<PHONE> then <IP> and <EMAIL>", 1L, 1L, 1L)))
    assert(got(3) === ((3L, "no pii here just words 1234 5.6", 0L, 0L, 0L)))
  }

  test("tf-idf top terms: rare term outranks frequent-everywhere term") {
    val docs = Seq(
      (0L, "spark spark spark unicorn"),
      (1L, "spark flink trino"),
      (2L, "spark beam dataflow")
    ).toDF("doc_id", "text")
    val top = TextPipeline.topTermsTfIdf(docs, k = 2)
    val d0 = top.filter(col("id") === 0L).orderBy("rank")
      .select("term").as[String].collect()
    // "spark" df=3 -> idf = ln(4/4)+1 = 1, tf=3 -> 3.0
    // "unicorn" df=1 -> idf = ln(4/2)+1 ~ 1.693, tf=1 -> 1.693 (rank 2)
    assert(d0.toSeq === Seq("spark", "unicorn"))
    val scores = top.filter(col("id") === 0L).orderBy("rank")
      .select("tfidf").as[Double].collect()
    assert(math.abs(scores(0) - 3.0) < 1e-9)
    assert(math.abs(scores(1) - (math.log(2.0) + 1.0)) < 1e-3)
    // every doc gets at most k rows, rank starts at 1
    val byDoc = top.groupBy("id").agg(count(lit(1)).as("c"), min("rank").as("mn"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(byDoc.forall { case (c, mn) => c <= 2 && mn == 1L })
    // the two join regimes (broadcast idf hint vs plain join for monster
    // vocabularies) produce identical rows — broadcastVocabLimit = 0
    // forces the fallback arm
    val fb = TextPipeline.topTermsTfIdf(docs, k = 2, broadcastVocabLimit = 0L)
      .orderBy("id", "rank").collect().map(_.toSeq).toSeq
    val main = top.orderBy("id", "rank").collect().map(_.toSeq).toSeq
    assert(fb === main)
    // ties on the rounded score break by term asc through the bounded
    // aggregate exactly like the former rank window: doc of four
    // once-terms, k=2 keeps the two alphabetically-first
    val tied = Seq((0L, "delta apple carrot banana")).toDF("doc_id", "text")
    val tiedTop = TextPipeline.topTermsTfIdf(tied, k = 2)
      .orderBy("rank").select("term").as[String].collect().toSeq
    assert(tiedTop === Seq("apple", "banana"))
  }

  test("stratified sample is deterministic, honors per-stratum rates") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val sampled = TextPipeline.stratifiedSample(docs, "source", col("doc_id"),
      Map("src0" -> "20", "src1" -> "80"), default = "ff")
    val counts = sampled.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 per stratum; expected keep: src0 ~ 32/256 (12.5%), src1 ~ 50%,
    // src2/src3 ~ 255/256 (the "ff" threshold excludes only md5 prefix "ff")
    assert(counts("src0") > 30 && counts("src0") < 110)
    assert(counts("src1") > 190 && counts("src1") < 310)
    assert(counts("src2") > 480)
    // deterministic: same call, same rows
    val again = TextPipeline.stratifiedSample(docs, "source", col("doc_id"),
      Map("src0" -> "20", "src1" -> "80"), default = "ff")
      .select("doc_id").as[Long].collect().toSet
    assert(again === sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("gopher filter: each rule fires on its planted violation, clean doc keeps") {
    val clean = (1 to 60).map(i => s"word$i").mkString(" ") // 60 distinct 5+-char words
    val docs = Seq(
      (0L, clean),
      (1L, "too short"), // fails ok_words
      (2L, (1 to 60).map(_ => "ab").mkString(" ")), // mean len 2 -> fails ok_mean_len
      (3L, clean + " " + (1 to 12).map(i => s"#tag$i").mkString(" ")), // fails ok_symbols
      (4L, (1 to 30).map(_ => "spam repeat now").mkString(" ")) // fails ok_repetition
    ).toDF("doc_id", "text")
    val got = TextPipeline.gopherQualityFilter(docs,
      minWords = 20, maxWords = 100000, maxSymbolWordRatio = 0.1,
      maxDupTrigramFrac = 0.55, maxTopBigramFrac = 0.15)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Boolean]("ok_words"), r.getAs[Boolean]("ok_mean_len"),
          r.getAs[Boolean]("ok_symbols"), r.getAs[Boolean]("ok_repetition"),
          r.getAs[Boolean]("keep"))).toMap
    assert(got(0L) === ((true, true, true, true, true)))
    assert(got(1L)._1 === false && got(1L)._5 === false)
    assert(got(2L)._2 === false && got(2L)._5 === false)
    assert(got(3L)._3 === false && got(3L)._5 === false)
    assert(got(4L)._4 === false && got(4L)._5 === false)
    // exact signal spot-check for the boilerplate doc: 90 tokens of a
    // 3-token cycle -> 3 distinct trigrams over 88 -> dup = 1 - 3/88
    val sig = TextPipeline.gopherQualityFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("dup_trigram_frac")).toMap
    assert(math.abs(sig(4L) - (1.0 - 3.0 / 88.0)) < 1e-3)
  }

  test("token budget sample: greedy md5-order fill per stratum, exact budgets") {
    val docs = (0 until 40).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      (i.toLong, src, (1 to 10).map(j => s"t${i}_$j").mkString(" ")) // 10 tokens each
    }.toDF("doc_id", "source", "text")
    val got = TextPipeline.tokenBudgetSample(docs, "source",
      Map("a" -> 52L), defaultBudget = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byStratum = got.groupBy(_._2)
    // 10-token docs: budget 52 -> exactly 5 docs (cum 50); default 100 -> 10
    assert(byStratum("a").length === 5)
    assert(byStratum("b").length === 10)
    assert(byStratum("a").map(_._3).sum === 50L)
    assert(got.forall(_._4 <= 100L))
    // deterministic: same rows on re-run
    val again = TextPipeline.tokenBudgetSample(docs, "source",
      Map("a" -> 52L), defaultBudget = 100L)
      .select("id").as[Long].collect().toSet
    assert(again === got.map(_._1).toSet)
    // keepFirst: a stratum whose first doc exceeds its budget still returns it
    val one = TextPipeline.tokenBudgetSample(docs, "source",
      Map("a" -> 5L, "b" -> 5L), defaultBudget = 5L, keepFirst = true)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(one.groupBy(_._1).forall(_._2.length == 1))
    assert(TextPipeline.tokenBudgetSample(docs, "source",
      Map("a" -> 5L, "b" -> 5L), defaultBudget = 5L).count() === 0L)
  }

  test("token budget sample: distributed prefix scan matches a driver scan on one giant stratum") {
    // one stratum spanning every range partition — the skew case the
    // distributed scan exists for; token counts vary so offset mistakes
    // can't cancel out
    val docs = (0 until 3000).map { i =>
      (i.toLong, "only", (1 to (1 + i % 7)).map(j => s"x${i}_$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val got = TextPipeline.tokenBudgetSample(docs, "source",
      Map.empty, defaultBudget = 4000L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    // reference: the same greedy md5-order walk computed on the driver
    def key(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = (0 until 3000).map(i => (i.toLong, 1L + i % 7)).sortBy { case (id, _) => (key(id), id) }
    var cum = 0L
    val expect = ordered.map { case (id, n) => cum += n; (id, n, cum) }.takeWhile(_._3 <= 4000L)
    assert(got.toSeq === expect)
  }

  test("unigram NLL: hand-computed corpus-LM scores") {
    // corpus: 6 tokens total; p(a)=3/6, p(b)=2/6, p(c)=1/6
    val docs = Seq((0L, "a a b"), (1L, "a b c")).toDF("doc_id", "text")
    val got = TextPipeline.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def nll(ps: Seq[Double]) =
      BigDecimal(ps.map(p => -math.log(p)).sum / ps.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) === ((3L, nll(Seq(0.5, 0.5, 2.0 / 6)))))
    assert(got(1L) === ((3L, nll(Seq(0.5, 2.0 / 6, 1.0 / 6)))))
  }

  test("dsir weights: target-like docs score above off-target docs") {
    // target = docs 0-3 ("alpha beta" domain); raw adds a "gamma delta"
    // domain. A held-out alpha-beta doc must weigh above any gamma-delta
    // doc, and weights must be reproducible across runs.
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha"),
      (1L, "beta alpha beta alpha beta"),
      (2L, "alpha alpha beta beta alpha"),
      (3L, "beta beta alpha alpha alpha"),
      (4L, "alpha beta beta alpha alpha"), // held-out target-like
      (5L, "gamma delta gamma delta gamma"),
      (6L, "delta gamma delta gamma delta"),
      (7L, "gamma gamma delta delta gamma")
    ).toDF("doc_id", "text")
    val bc = TextPipeline.dsirBuckets(docs, buckets = 1024)
    val target = docs.filter(col("doc_id") <= 3L).select(col("doc_id").as("id"))
    def weights() = TextPipeline.dsirWeightsFromBuckets(bc, target, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = weights()
    assert(w.size === 8)
    for (t <- Seq(0L, 1L, 2L, 3L, 4L); o <- Seq(5L, 6L, 7L))
      assert(w(t) > w(o), s"target-like $t (${w(t)}) vs off-target $o (${w(o)})")
    assert(weights() === w) // deterministic
  }

  test("language ID: script vote for non-Latin, stopword profiles for Latin") {
    val docs = Seq(
      (0L, "the cat sat on the mat and it was happy for a while"), // en
      (1L, "der hund und die katze das ist nicht mit ein haus"), // de
      (2L, "el perro y la casa de que un gato es se no"), // es
      (3L, "le chien et les maisons des chats dans la rue que"), // fr
      (4L, "il cane di che la casa per con una strada del"), // it
      (5L, "o cachorro de que e do da em um para com"), // pt
      (6L, "这是一个中文句子 中文内容很多"), // zh (Han)
      (7L, "これは日本語の文章です ひらがなとカタカナ"), // ja
      (8L, "이것은 한국어 문장입니다"), // ko
      (9L, "это русское предложение с буквами"), // ru
      (10L, "هذه جملة عربية مكتوبة بالحروف"), // ar
      (11L, "यह एक हिंदी वाक्य है"), // hi
      (12L, ""), // empty -> und
      (13L, "   "), // whitespace-only -> und
      (14L, "zxqj vvkw pppt mmmr qqts") // no profile hits -> en default
    ).toDF("doc_id", "text")
    val got = TextPipeline.languages(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(0L -> "en", 1L -> "de", 2L -> "es", 3L -> "fr", 4L -> "it",
      5L -> "pt", 6L -> "zh", 7L -> "ja", 8L -> "ko", 9L -> "ru", 10L -> "ar",
      11L -> "hi", 12L -> "und", 13L -> "und", 14L -> "en")
    assert(got === want)
    // single-Column convenience form agrees with the layered pipeline
    val viaCol = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.lang_id(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCol === want)
  }

  test("packSequences: spans are contiguous in id order, windows cover spans, empty docs degenerate") {
    // doc 0: 3 tokens, doc 1: empty, doc 2: 4 tokens, doc 3: 2 tokens;
    // ctx=4 -> stream [0,9): doc0 [0,3) w0, doc1 [3,3) w0, doc2 [3,7)
    // spans w0-w1, doc3 [7,9) spans w1-w2
    val docs = Seq(
      (0L, "a b c"), (1L, "   "), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val got = TextPipeline.packSequences(docs, contextLen = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 3L, 0L, 0L, 0L),
      (1L, 0L, 3L, 0L, 0L),
      (2L, 4L, 3L, 0L, 1L),
      (3L, 2L, 7L, 1L, 2L)))
    // multi-partition prefix scan agrees with the single-partition truth
    val many = (0L until 200L).map(i => (i, Seq.fill((i % 7).toInt + 1)("t").mkString(" ")))
      .toDF("doc_id", "text").repartition(16)
    val packed = TextPipeline.packSequences(many, contextLen = 32)
      .orderBy("doc_id").collect().map(r => (r.getLong(2), r.getLong(1)))
    val expectStarts = packed.map(_._2).scanLeft(0L)(_ + _).init
    assert(packed.map(_._1).toSeq === expectStarts.toSeq)
  }

  test("seedClassifier: hand-computed NB log-odds, keep decision, zero-prior symmetry") {
    // pos tokens: aa:3 bb:2 (pt=5); neg: cc:3 bb:1 (nt=4); V=3; prior ln(2/2)=0
    // logodds(aa)=ln(4/8)-ln(1/7); (bb)=ln(3/8)-ln(2/7); (cc)=ln(1/8)-ln(4/7)
    val docs = Seq(
      (0L, "aa aa bb"), (1L, "aa bb"), (2L, "cc cc bb"), (3L, "cc"))
      .toDF("doc_id", "text")
    val seed = Seq(0L, 1L).toDF("doc_id")
    val got = TextPipeline.seedClassifier(docs, seed)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val aa = math.log(4.0 / 8.0) - math.log(1.0 / 7.0)
    val bb = math.log(3.0 / 8.0) - math.log(2.0 / 7.0)
    val cc = math.log(1.0 / 8.0) - math.log(4.0 / 7.0)
    val want = Seq(
      (0L, 3L, 2 * aa + bb, true), (1L, 2L, aa + bb, true),
      (2L, 3L, 2 * cc + bb, false), (3L, 1L, cc, false))
    got.zip(want).foreach { case ((id, n, s, k), (wid, wn, ws, wk)) =>
      assert(id === wid && n === wn && k === wk)
      assert(math.abs(s - math.rint(ws * 1e4) / 1e4) < 1e-9, s"doc $id")
    }
    // seed-like unseen doc scores above background-like unseen doc
    val docs2 = docs.union(Seq((4L, "aa aa aa"), (5L, "cc cc cc")).toDF("doc_id", "text"))
    val m = TextPipeline.seedClassifier(docs2, seed)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(4L) > m(5L))
  }

  test("mixtureWeights: hand-computed temperature scaling, alpha edge cases") {
    // source A: 8 tokens over 2 docs, B: 2 tokens; alpha=0.5, budget=100
    val docs = Seq(
      (0L, "A", "w w w w"), (1L, "A", "w w w w"), (2L, "B", "w w"))
      .toDF("doc_id", "source", "text")
    val got = TextPipeline.mixtureWeights(docs, alpha = 0.5, budget = 100L)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got(0) === ("A", 2L, 8L, 0.8, 0.666667, 66.6667, 8.333333))
    assert(got(1) === ("B", 1L, 2L, 0.2, 0.333333, 33.3333, 16.666667))
    // alpha=1 reduces to natural sampling; alpha=0 to uniform
    val nat = TextPipeline.mixtureWeights(docs, alpha = 1.0, budget = 100L)
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    nat.foreach { case (raw, w) => assert(math.abs(raw - w) < 1e-9) }
    val uni = TextPipeline.mixtureWeights(docs, alpha = 0.0, budget = 100L)
      .collect().map(_.getDouble(4))
    assert(uni.toSeq === Seq(0.5, 0.5))
    // weights always sum to 1
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-6)
  }

  test("corpusStats: exact mode hand-computed; HLL mode within rsd") {
    val docs = Seq(
      (0L, "A", "x y z"), (1L, "A", "x y z"), // dup text
      (2L, "A", "x w"), (3L, "B", "p q r s"))
      .toDF("doc_id", "source", "text")
    val exact = TextPipeline.corpusStats(docs, approx = false)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(exact.toSeq === Seq(("A", 3L, 8L, 2L, 4L), ("B", 1L, 4L, 1L, 4L)))
    // approx (HLL) mode: same groups, cardinalities within 5% on a
    // corpus with ~500 distinct values per dimension
    val big = (0L until 600L).map(i =>
      (i, if (i % 3 == 0) "even" else "odd", s"tok$i shared tok${i % 397}"))
      .toDF("doc_id", "source", "text")
    val ex = TextPipeline.corpusStats(big, approx = false).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val ap = TextPipeline.corpusStats(big, approx = true, rsd = 0.02).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(ap.keySet === ex.keySet)
    ex.foreach { case (g, (dt, vb)) =>
      assert(math.abs(ap(g)._1 - dt).toDouble / dt < 0.05, s"$g distinct_texts")
      assert(math.abs(ap(g)._2 - vb).toDouble / vb < 0.05, s"$g vocab")
    }
  }

  test("span_corrupt: exact reconstruction, determinism, masked-fraction band") {
    import graft.functions.GraftFunctions.{span_corrupt, tokenize}
    val docs = (0L until 200L).map { id =>
      (id, (0 until 120).map(j => s"w${(id * 7 + j) % 50}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), col("text"),
      span_corrupt(tokenize(col("text")), col("doc_id")).as("sc"))
      .select(col("doc_id"), col("text"), col("sc.input"), col("sc.target"),
        col("sc.n_masked"), col("sc.n_spans"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    // exact reconstruction: substitute each sentinel in the input with
    // its target span -> the original token sequence
    out.foreach { case (id, text, input, target, nMasked, nSpans) =>
      val spans = collection.mutable.Map.empty[String, Seq[String]]
      if (nSpans > 0) {
        var cur: String = null
        val buf = collection.mutable.ArrayBuffer.empty[String]
        target.split(" ").foreach { t =>
          if (t.startsWith("<extra_id_")) {
            if (cur != null) spans(cur) = buf.toSeq
            cur = t; buf.clear()
          } else buf += t
        }
        if (cur != null) spans(cur) = buf.toSeq
      }
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
      }.mkString(" ")
      assert(rebuilt === text.split("\\s+").filter(_.nonEmpty).mkString(" "), s"doc $id")
      assert(spans.values.map(_.size).sum.toLong === nMasked)
      assert(spans.size.toLong === nSpans)
    }
    // deterministic across runs
    val again = docs.select(span_corrupt(tokenize(col("text")), col("doc_id")).as("sc"))
      .select(col("sc.input")).collect().map(_.getString(0)).toSeq
    assert(again === out.sortBy(_._1).map(_._3).toSeq ||
      again.sorted === out.map(_._3).toSeq.sorted)
    // corpus-level masked fraction ~ startPermille/1000 * meanSpan = 15%
    val total = out.map(_._2.split("\\s+").length.toLong).sum
    val masked = out.map(_._5).sum
    val frac = masked.toDouble / total
    assert(frac > 0.08 && frac < 0.25, s"masked fraction $frac")
  }

  test("chunkDocuments: exact sliding-window math, tail chunk, overlap, empty doc") {
    val docs = Seq(
      (0L, (1 to 30).map(i => s"w$i").mkString(" ")), // 30 toks: starts 0,12,24
      (1L, "a b c"),                                  // shorter than one chunk
      (2L, "   ")                                     // zero tokens: no chunks
    ).toDF("doc_id", "text")
    val got = TextPipeline.chunkDocuments(docs, chunkTokens = 16, overlapTokens = 4)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.count(_._1 == 0L) === 3)
    assert(got.count(_._1 == 1L) === 1)
    assert(!got.exists(_._1 == 2L))
    val c0 = got.filter(_._1 == 0L)
    assert(c0(0)._3 === (1 to 16).map(i => s"w$i").mkString(" ") && c0(0)._4 === 16L)
    assert(c0(1)._3 === (13 to 28).map(i => s"w$i").mkString(" ") && c0(1)._4 === 16L)
    assert(c0(2)._3 === (25 to 30).map(i => s"w$i").mkString(" ") && c0(2)._4 === 6L)
    // consecutive chunks share exactly the overlap
    assert(c0(0)._3.split(" ").takeRight(4).toSeq === c0(1)._3.split(" ").take(4).toSeq)
    assert(got.find(_._1 == 1L).get._3 === "a b c")
    assert(got.find(_._1 == 1L).get._4 === 3L)
  }

  test("weightedSample: matches driver A-ES reference, scale-invariant, weight-biased") {
    import graft.operators.TextPipeline.weightedSample
    val docs = (0L until 500L).map(i => (i, if (i < 250) 10.0 else 1.0))
      .toDF("doc_id", "w")
    val got = weightedSample(docs, col("w"), k = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 100)
    // driver reference: same md5-derived uniform, same key
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    val ref = (0L until 500L).map(i => (i, if (i < 250) 10.0 else 1.0))
      .map { case (id, w) => (id, w, math.log(u(id)) / w) }
      .sortBy { case (id, _, k0) => (-k0, id) }.take(100)
    assert(got.map(_._1).toSeq === ref.map(_._1).toSeq)
    // high-weight half dominates the sample (p ~ 10:1 per doc)
    val heavy = got.count(_._1 < 250)
    assert(heavy > 70, s"heavy-half count $heavy")
    // scale invariance: multiplying all weights by a constant changes
    // nothing about the selection or its order
    val scaled = weightedSample(
      docs.select(col("doc_id"), (col("w") * 37.0).as("w")), col("w"), k = 100)
      .collect().map(_.getLong(0))
    assert(scaled.toSeq === got.map(_._1).toSeq)
    // zero/negative weights are excluded
    val mixed = (0L until 10L).map(i => (i, if (i % 2 == 0) 1.0 else 0.0))
      .toDF("doc_id", "w")
    val surv = weightedSample(mixed, col("w"), k = 10).collect().map(_.getLong(0))
    assert(surv.forall(_ % 2 == 0) && surv.length === 5)
  }
}
