package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-analysis operators over a documents table — the language-ID /
  * quality / token-count / fingerprint surface of a training-data
  * pipeline. All-native expressions except language-ID (per-row UDF). */
object TextPipeline {

  /** Per-document token statistics (all native, single pass). */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      token_count_ws(col(textCol)).as("n_tokens_ws"),
      token_count_bpe(col(textCol)).as("n_tokens_bpe"),
      round(mean_token_len(col(textCol)), 4).as("mean_token_len"),
      round(alpha_ratio(col(textCol)), 4).as("alpha_ratio"),
      round(punct_ratio(col(textCol)), 4).as("punct_ratio"),
      round(stopword_ratio(col(textCol)), 4).as("stopword_ratio"))

  /** Quality scoring: components + composite heuristic score. */
  def qualityScores(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      quality_score(col(textCol)).as("quality"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Language identification (script vote + stopword profiles).
    *
    * Layered projections: tokens, then the per-profile score array, then
    * the pick — each layer's output is multiply-referenced and expensive,
    * so CollapseProject keeps them as separate projections and every row
    * is tokenized exactly once (the single-Column `lang_id` form would
    * re-tokenize per score reference). Fully codegen: the only kernel is
    * the per-char script vote. */
  def languages(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), col(textCol).as("_t"), tokenize(col(textCol)).as("_toks"))
      .withColumn("_scores", lang_id_scores(col("_toks")))
      .select(col(idCol),
        lang_id_pick(col("_t"), col("_toks"), col("_scores")).as("lang_pred"))

  /** Content fingerprints: rolling hash (engine-native) + md5 of the
    * normalized text (cross-engine checkable). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      doc_fingerprint(col(textCol)).as("fingerprint"),
      md5(concat_ws(" ", tokenize(col(textCol)))).as("content_md5"))

  /** Per-document top-`k` terms by TF-IDF — the corpus-statistics pass of
    * a training-data pipeline (topic/keyword profiling, boilerplate
    * spotting). Classic two-aggregation formulation, all shuffles on
    * bounded keys: term frequencies partial-aggregate map-side by
    * (doc, term); document frequencies by term; the per-doc top-k is a
    * rank window over at most |vocab-per-doc| rows.
    * `idf = ln((N + 1) / (df + 1)) + 1` (smoothed), ties broken by term
    * ascending. Returns `[id, term, tfidf, rank]`. */
  def topTermsTfIdf(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    val toks = Gen.explodeOnce(Par.ensure(docs),
      Seq(col(idCol).as("id")), tokenize(col(textCol)), "term")
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus size: single-row aggregate, broadcast into the score expr
    val n = docs.select(count(lit(1)).as("n"))
    val score = col("tf") * (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
    // rank on the ROUNDED score: engines' ln() may differ by 1 ulp, and an
    // unrounded ORDER BY would let near-equal scores rank-swap across
    // engines before the term tiebreak kicks in
    val w = Window.partitionBy("id").orderBy(round(score, 4).desc, col("term").asc)
    tf.join(dfq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), round(score, 4).as("tfidf"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic stratified sampling: keep a row iff the first two hex
    * chars of `md5(key)` fall under the stratum's threshold — rates are
    * expressed in 256ths ("40" = 64/256 = 25%). Content-hash gating makes
    * the sample reproducible across engines and runs (no RNG state), a
    * map-only pass at any scale, and consistent under re-partitioning —
    * the properties a 100 TB pipeline needs from its sampler.
    *
    * @param rates   stratum value -> 2-hex-digit threshold ("00".."ff")
    * @param default threshold for strata not in `rates` */
  def stratifiedSample(
      docs: DataFrame,
      strataCol: String,
      keyCol: Column,
      rates: Map[String, String],
      default: String = "80"): DataFrame = {
    require((rates.values.toSeq :+ default).forall(_.matches("[0-9a-f]{2}")),
      "thresholds must be 2 lowercase hex digits")
    val th = rates.foldLeft(lit(default)) { case (acc, (stratum, t)) =>
      when(col(strataCol) === stratum, lit(t)).otherwise(acc)
    }
    docs.filter(substring(md5(keyCol.cast("string").cast("binary")), 1, 2) < th)
  }

  /** Gopher-style repetition signals (Rae et al. 2021, §A.1.1), token
    * n-gram variant: per document, the fraction of duplicate n-grams
    * (`1 - distinct/total`) and the share of the single most frequent
    * n-gram (`mode_count/total`) — high values flag templated/boilerplate
    * text for quality filtering.
    *
    * Scale shape: exploded (doc, n, gram) rows through two
    * partial-aggregating groupBys — per-gram counts, then per-(doc, n)
    * totals/max — so a single pathological 100k-token document costs
    * O(tokens) distributed work, never the O(tokens^2) of per-row modal
    * array expressions; hot (doc, n, gram) keys are bounded map-side by
    * the partial count.
    *
    * Returns `[id, dup_unigram_frac, dup_bigram_frac, dup_trigram_frac,
    * top_bigram_frac, top_trigram_frac]`, one row per input document
    * (token-free documents score 0 everywhere). */
  def repetitionSignals(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = Par.ensure(docs)
      .select(col(idCol).as("id"), tokenize(col(textCol)).as("toks"))
    def gramsOf(n: Int): Column =
      if (n == 1) col("toks")
      else when(size(col("toks")) >= n,
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val exploded = Gen.explodeOnce(toks, Seq(col("id")),
      flatten(array(Seq(1, 2, 3).map(n =>
        transform(gramsOf(n), g => struct(lit(n).as("n"), g.as("g")))): _*)), "e")
      .select(col("id"), col("e.n").as("n"), col("e.g").as("g"))
    val perN = exploded
      .groupBy("id", "n", "g").agg(count(lit(1)).as("c"))
      .groupBy("id", "n").agg(
        sum(col("c")).as("total"), count(lit(1)).as("nd"), max(col("c")).as("top"))
    val dupFrac = lit(1.0) - col("nd").cast("double") / col("total")
    val topFrac = col("top").cast("double") / col("total")
    def pick(n: Int, v: Column) = max(when(col("n") === n, round(v, 4)))
    val sig = perN.groupBy("id").agg(
      pick(1, dupFrac).as("dup_unigram_frac"),
      pick(2, dupFrac).as("dup_bigram_frac"),
      pick(3, dupFrac).as("dup_trigram_frac"),
      pick(2, topFrac).as("top_bigram_frac"),
      pick(3, topFrac).as("top_trigram_frac"))
    // docs shorter than n produce no (id, n) group; empty docs none at all
    docs.select(col(idCol).as("id")).join(sig, Seq("id"), "left")
      .select(col("id") +:
        Seq("dup_unigram_frac", "dup_bigram_frac", "dup_trigram_frac",
          "top_bigram_frac", "top_trigram_frac")
          .map(c => coalesce(col(c), lit(0.0)).as(c)): _*)
  }

  /** PII redaction — replace emails, phone-number shapes, and IPv4
    * addresses with typed placeholder tokens, the standard scrubbing pass
    * before a training-data release. An all-native `regexp_replace` chain
    * (codegen, map-only at any scale); patterns stay inside the
    * RE2-compatible subset (no lookaround/backrefs) so the exact same
    * regexes replay in DuckDB and other engines. Redaction is sequential
    * (email, then phone, then IP) and each count is taken on the text as
    * it looked when that pattern ran, so counts and output agree.
    * Returns `[id, text_redacted, n_emails, n_phones, n_ips]`. */
  def redactPii(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    // separators restricted to space/dash so dotted IPv4 never half-matches
    val phone = """(\+\d{1,2}[ -])?(\(\d{3}\)[ -]?|\d{3}[ -])\d{3}[ -]?\d{4}\b"""
    val ip = """\b(\d{1,3}\.){3}\d{1,3}\b"""
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, lit(email), lit("<EMAIL>"))
    val t2 = regexp_replace(t1, lit(phone), lit("<PHONE>"))
    val t3 = regexp_replace(t2, lit(ip), lit("<IP>"))
    docs.select(
      col(idCol).as("id"),
      t3.as("text_redacted"),
      size(regexp_extract_all(t0, lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t1, lit(phone), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t2, lit(ip), lit(0))).cast("long").as("n_ips"))
  }

  /** Composite preprocessing pass — the canonical training-data cleaning
    * pipeline, one distributed job: exact-dedup (keep smallest id per
    * normalized-content group) then token-count and stopword-ratio gates.
    * Returns the surviving `[id, n_tokens]` rows. */
  def preprocess(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      maxStopwordRatio: Double = 0.9): DataFrame = {
    val withStats = Par.ensure(docs).select(
      col(idCol).as("id"),
      md5(concat_ws(" ", tokenize(col(textCol)))).as("content_hash"),
      token_count_ws(col(textCol)).cast("long").as("n_tokens"),
      stopword_ratio(col(textCol)).as("swr"))
    // "keep smallest id per content group" as one window pass: a single
    // shuffle by content_hash, vs the groupBy+semi-join formulation's two
    // (and its second computation of the text stats)
    withStats
      .withColumn("min_id", min(col("id")).over(Window.partitionBy("content_hash")))
      .filter(col("id") === col("min_id") &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("swr") < maxStopwordRatio)
      .select(col("id"), col("n_tokens"))
  }
}
