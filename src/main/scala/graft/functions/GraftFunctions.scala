package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

/** Public function surface of the engine: distance kernels, tokenization +
  * stemming (term pipeline of the reference,
  * rs/index/src/segment/mutable_segment.rs:73-103), and the training-data
  * text/dedup primitives. Everything here returns `Column`s built from
  * codegen-friendly native expressions; the only Scala UDF left is
  * stemming (per-row dictionary-heavy string work, invoked once per
  * document); language-ID is native + a codegen script-vote kernel.
  */
object GraftFunctions {
  private def ex(c: Column) = ColumnBridge.expression(c)
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    ColumnBridge.column(e)

  // ---- vector kernels (V1, V2; SURVEY §2.8) ----
  def l2_distance(a: Column, b: Column): Column = col(L2Distance(ex(a), ex(b)))
  def l2_distance_squared(a: Column, b: Column): Column = col(L2DistanceSquared(ex(a), ex(b)))
  def dot_product(a: Column, b: Column): Column = col(DotProduct(ex(a), ex(b)))
  def cosine_similarity(a: Column, b: Column): Column = col(CosineSimilarity(ex(a), ex(b)))

  /** Literal query vector as an array<double> column. */
  def vec(values: Seq[Double]): Column = array(values.map(lit): _*)

  /** Decode a little-endian packed-f32 binary column to array<float>
    * (InsertPacked wire fast path, SURVEY §2.1 S2). */
  def unpack_f32_le(bin: Column): Column = col(UnpackF32Le(ex(bin)))

  /** Encode an array<float> column as little-endian packed-f32 binary —
    * the builder half of the InsertPacked wire; inverse of
    * [[unpack_f32_le]]. */
  def pack_f32_le(arr: Column): Column = col(PackF32Le(ex(arr)))

  /** Decode a binary code column (one unsigned byte per code — PQ/SQ8
    * code arrays) to array<int> 0..255, for SQL-oracle replay. */
  def unpack_u8(bin: Column): Column = col(UnpackU8(ex(bin)))

  /** Multi-assignment nearest-centroid indices (index-build kernel). */
  def nearest_centroids(vector: Column, flatCentroids: Array[Double],
      dim: Int, maxC: Int, pct: Double): Column =
    col(NearestCentroids(ex(vector.cast("array<double>")), flatCentroids, dim, maxC, pct))

  /** Two-level pruned variant (see [[NearestCentroidsPruned]]). */
  def nearest_centroids_pruned(vector: Column, flatCentroids: Array[Double],
      groupFlat: Array[Double], memberOffsets: Array[Int], memberIdx: Array[Int],
      dim: Int, maxC: Int, pct: Double, probeGroups: Int): Column =
    col(NearestCentroidsPruned(ex(vector.cast("array<double>")), flatCentroids,
      groupFlat, memberOffsets, memberIdx, dim, maxC, pct, probeGroups))

  /** Canonical meeting-site predicate for co-partitioned pair joins
    * (see [[CanonicalSite]]). */
  def canonical_site(probes: Column, assigns: Column, site: Column): Column =
    col(CanonicalSite(ex(probes), ex(assigns), ex(site)))

  // ---- tokenization / terms (T1-T4; SURVEY §2.7) ----

  /** Whitespace tokenizer, lowercased; drops empty tokens.
    * (rs/index/src/tokenizer/white_space_tokenizer.rs:5-60) */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** In-row word n-gram tally: `[(term, tf)]` over space-joined n-grams —
    * see [[graft.functions.TextKernels.ngramCounts]]. */
  def ngram_counts(tokens: Column, n: Int): Column =
    col(NgramCounts(ex(tokens), n))

  /** In-row `[(term, tf)]` tally over a token array — the map-side tf
    * build (nothing token-exploded ever shuffles); see
    * [[graft.functions.TextKernels.termCounts]]. */
  def term_counts(tokens: Column): Column = col(TermCounts(ex(tokens)))

  // Per-executor stem memo: corpora repeat tokens far more often than the
  // vocabulary grows, and the stemmers are pure, so a vocabulary-sized
  // cache turns the dominant cost of the term pipeline into a hash probe.
  // Bounded (clear-on-full) so an adversarial vocabulary can't grow it
  // past ~tens of MB per executor.
  private val stemCacheCap = 1 << 20
  private val stemCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // key = "<lang> <token>": tokens are whitespace-split upstream, so the
  // space separator cannot occur inside a token and keys never collide
  @inline private def memoStem(key: String)(f: => String): String = {
    val hit = stemCache.get(key)
    if (hit != null) hit
    else {
      val v = f
      if (stemCache.size >= stemCacheCap) stemCache.clear()
      stemCache.put(key, v)
      v
    }
  }

  private val stemUdf = udf { (tokens: Seq[String], lang: String) =>
    // Vietnamese falls back to the English stemmer exactly as the
    // reference does (stemming_tokenizer.rs:26). All 18 other reference
    // languages dispatch to a Snowball stemmer ([[Snowball]] /
    // [[SnowballMore]]); unknown languages are lowercase passthrough.
    if (tokens == null) null
    else if (lang == null || lang == "english" || lang == "en" ||
      lang == "vietnamese" || lang == "vi")
      tokens.map(t => memoStem(s"en $t")(Porter2.stem(t)))
    else if (Snowball.supported(lang))
      tokens.map(t => memoStem(s"$lang $t")(Snowball.stem(lang, t.toLowerCase)))
    else tokens.map(_.toLowerCase)
  }

  /** Stem an array of tokens (rs/index/src/tokenizer/stemming_tokenizer.rs:16-60). */
  def stem_tokens(tokens: Column, lang: Column): Column = stemUdf(tokens, lang)
  def stem_tokens(tokens: Column): Column = stemUdf(tokens, lit("english"))

  /** Tokenize + stem a raw text column — the indexing-side term pipeline. */
  def analyze_text(text: Column, lang: Column): Column = stem_tokens(tokenize(text), lang)
  def analyze_text(text: Column): Column = stem_tokens(tokenize(text))

  /** `"{field}:{token}"` term keys (rs/index/src/segment/mutable_segment.rs:92-99). */
  def term_keys(field: String, tokens: Column): Column =
    transform(tokens, t => concat(lit(field + ":"), t))

  /** Per-row inverted postings WITH POSITIONS over an analyzed token
    * array: `array<struct<term:string, positions:array<int>>>`, one entry
    * per DISTINCT token, positions = 0-based indexes of that token in the
    * analyzed stream (ascending by construction). Beyond the reference —
    * its term index stores point ids only
    * (rs/index/src/segment/mutable_segment.rs:73-103); positions are what
    * phrase and proximity queries (Lucene-style) consume. Built entirely
    * from native higher-order functions, so the terms-table stage of a
    * flush stays map-only (no groupBy/collect_list shuffle): the inner
    * `filter(sequence(...))` is O(distinct × len) per row — bounded by the
    * document itself, embarrassingly parallel at any corpus size. The
    * lambda never evaluates on an empty token array (`array_distinct` of
    * empty is empty), so `sequence(0, len-1)` cannot see len = 0.
    *
    * `tokens` is referenced once per element inside the lambdas — pass a
    * MATERIALIZED column (`withColumn("_toks", analyze_text(...))`, then
    * `col("_toks")`), never the stemming UDF expression itself, or the
    * UDF re-evaluates per (distinct token × position). Attribute reads
    * are free; CollapseProject keeps non-cheap aliases un-inlined. */
  def term_postings(field: String, tokens: Column): Column =
    transform(array_distinct(tokens), t =>
      struct(
        concat(lit(field + ":"), t).as("term"),
        filter(sequence(lit(0), size(tokens) - 1),
          i => element_at(tokens, i + 1) === t).as("positions")))

  /** 1-based position of the FIRST occurrence of `phrase` as consecutive
    * elements of an analyzed token array; null when absent. Pure
    * higher-order functions (codegen-friendly, map-only): the candidate
    * anchors are `sequence(0, len-n)` filtered by an all-terms-match
    * conjunction. The analyzed stream maps 1:1 onto the raw token stream
    * (stemming is per-token), so the returned position indexes BOTH —
    * match on the analyzed tokens, then excerpt the raw ones
    * ([[snippet_around]], Lucene-highlighter style). */
  def phrase_position(tokens: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "empty phrase")
    val n = phrase.size
    when(size(tokens) >= n,
      // try_element_at: a no-match filter result is EMPTY, and ANSI mode
      // makes plain element_at throw there instead of returning null
      try_element_at(
        filter(sequence(lit(0), size(tokens) - n), i =>
          phrase.zipWithIndex.map { case (t, j) =>
            element_at(tokens, i + j + 1) === lit(t)
          }.reduce(_ && _)),
        lit(1)) + 1)
  }

  /** Space-joined excerpt of `window` tokens around a 1-based anchor of a
    * `phraseLen`-token match (the match itself included), clamped to the
    * array bounds. */
  def snippet_around(tokens: Column, anchor: Column, phraseLen: Int, window: Int): Column = {
    val start = greatest(anchor - window, lit(1))
    val end = least(anchor + lit(phraseLen - 1) + lit(window), size(tokens))
    array_join(slice(tokens, start, end - start + 1), " ")
  }

  // ---- shingles / minhash / simhash (training-data dedup surface) ----

  /** 64-bit hashes of word n-gram shingles of a token array (one-pass
    * codegen kernel; see [[ShingleHashes]]). */
  def shingle_hashes(tokens: Column, n: Int): Column =
    col(ShingleHashes(ex(tokens), n))

  /** Positioned rolling hashes of every L-token window,
    * `array<struct<pos, h>>` — the substring-dedup pass
    * (see [[WindowHashes]]). */
  def window_hashes(tokens: Column, windowLen: Int): Column =
    col(WindowHashes(ex(tokens), windowLen))

  /** k-slot MinHash signature of a shingle-hash array. */
  def minhash_signature(shingles: Column, k: Int, seed: Long = 42L): Column =
    col(MinHashSignature(ex(shingles), k, seed))

  /** LSH band keys: split a k-slot signature into `bands` bands of
    * `rowsPerBand` and hash each; docs sharing any band key are candidates. */
  def lsh_band_keys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** 64-bit SimHash over token hashes. */
  def simhash(tokens: Column): Column =
    col(SimHash64(ex(transform(tokens, t => xxhash64(t)))))

  /** Hamming distance between two 64-bit sketches (native bit_count). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Multi-table hyperplane sign-bit LSH buckets of an embedding, with
    * optional multi-probe keys (codegen kernel; see [[HyperplaneSketch]]). */
  def hyperplane_sketch(vector: Column, flatPlanes: Array[Double],
      tables: Int, planes: Int, dim: Int, probes: Int = 0): Column =
    col(HyperplaneSketch(ex(vector.cast("array<double>")), flatPlanes,
      tables, planes, dim, probes))

  /** T5-style span corruption over a token array, keyed by a per-row
    * seed (see [[SpanCorrupt]]): struct(input, target, n_masked,
    * n_spans). */
  def span_corrupt(tokens: Column, seed: Column,
      startPermille: Int = 50, meanSpan: Int = 3): Column =
    col(SpanCorrupt(ex(tokens), ex(seed.cast("long")), startPermille, meanSpan))

  /** Canonical text normalization (NFC, diacritic strip, lowercase,
    * whitespace collapse) — see [[NormalizeText]]. */
  def normalize_text(text: Column): Column = col(NormalizeText(ex(text)))

  /** Map-only affine projection against a broadcast row-major k×dim
    * matrix — the PCA / whitening apply pass (see [[AffineProject]]). */
  def affine_project(vector: Column, flatRows: Array[Double],
      mean: Array[Double], dim: Int): Column =
    col(AffineProject(ex(vector.cast("array<double>")), flatRows, mean, dim))

  /** Bounded per-group top-k aggregate with map-side partial aggregation
    * (see [[TopKByScore]]): each task ships at most k (score, id) entries
    * per group instead of the group's full candidate set. */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    col(TopKByScore(ex(score), ex(id), k).toAggregateExpression())

  /** Bounded "best k terms" per group by (score desc, term asc) with
    * map-side partial aggregation (see [[TopKTerms]]). */
  def topk_terms(score: Column, term: Column, k: Int): Column =
    col(TopKTerms(ex(score), ex(term), k).toAggregateExpression())

  /** All a < b id pairs within an LSH bucket (in-task expansion; see
    * [[PairKernels]]). */
  def sorted_pairs(ids: Column): Column = col(SortedPairs(ex(ids)))

  /** SimHash bucket pair expansion with the Hamming verify fused in and
    * emit-once across LSH tables: input `array<struct<id, sk>>` plus the
    * bucket's table index; a pair is emitted only from the first table
    * whose key bits (given in `chunkMasks`) it collides in. Empty masks =
    * emit from every colliding table (caller dedups). */
  def hamming_pairs(entries: Column, chunk: Column, maxHamming: Int,
      chunkMasks: Array[Long] = Array.empty): Column =
    col(HammingPairs(ex(entries), ex(chunk), maxHamming, chunkMasks))

  /** Jaccard similarity of two arrays treated as sets (native). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  // ---- text analysis (training-data pipeline surface) ----

  /** Whitespace token count (native, no UDF). */
  def token_count_ws(text: Column): Column = size(tokenize(text))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (regex approximation of byte-pair
    * pre-tokenization). */
  def token_count_bpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]"), lit(0)))

  private val englishStop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "was", "at", "by", "be")

  /** Stopword ratio against a fixed English stopword list (native). */
  def stopword_ratio(text: Column): Column = {
    val toks = tokenize(text)
    val stops = filter(toks, t => t.isInCollection(englishStop))
    when(size(toks) === 0, 0.0).otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Punctuation character ratio (native). */
  def punct_ratio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        length(text).cast("double"))

  /** Alphabetic character ratio (native). */
  def alpha_ratio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") /
        length(text).cast("double"))

  /** Mean token length (native). */
  def mean_token_len(text: Column): Column = {
    val toks = tokenize(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Heuristic document quality score in [0,1]: rewards mid-length docs,
    * plain-language token shapes, and some stopword presence; punishes
    * punctuation walls. Deterministic, native expressions only. */
  def quality_score(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val meanLen = mean_token_len(text)
    val wordShape = when(meanLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    val punctPenalty = lit(1.0) - least(punct_ratio(text) * 4.0, lit(1.0))
    val stopScore = least(stopword_ratio(text) * 5.0, lit(1.0)) * 0.5 + 0.5
    round(lenScore * wordShape * punctPenalty * stopScore, 6)
  }

  /** Rolling-hash document fingerprint: polynomial hash (base 1000003,
    * mod 2^64) over the lowercased, whitespace-normalized text — equal
    * fingerprints ⇔ equal normalized content (modulo 64-bit collisions). */
  def doc_fingerprint(text: Column): Column = {
    val norm = concat_ws(" ", tokenize(text))
    col(RollingHash(ex(norm)))
  }

  // ---- language ID (n-gram/stopword heuristic; training-data surface) ----
  // ordered by lang code so the argmax tiebreak ("largest code wins",
  // same as the q31 oracle's CASE chain) is explicit
  private val stopProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "est", "dans", "que"),
    "it" -> Seq("il", "di", "che", "la", "per", "con", "una", "sono", "non", "del"),
    "pt" -> Seq("o", "de", "que", "e", "do", "da", "em", "um", "para", "com"))

  /** Dominant-script language or null for Latin/other (codegen kernel;
    * see [[TextKernels.scriptVote]]). */
  def script_vote(text: Column): Column = col(ScriptVote(ex(text)))

  /** Per-profile stopword scores `|toks ∩ profile| / |toks|` as a
    * 6-element array in [[stopProfiles]] order (en, de, es, fr, it, pt).
    * Pass a materialized token COLUMN, not `tokenize(...)` inline — the
    * six filters each reference it, and an attribute read is free where
    * an inlined re-tokenize is six regex splits per row. */
  def lang_id_scores(toks: Column): Column = array(stopProfiles.map { case (_, stops) =>
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isInCollection(stops))).cast("double") /
        size(toks).cast("double"))
  }: _*)

  /** Final language pick from precomputed scores: script vote first, then
    * argmax over the stopword scores with ties to the lexicographically-
    * largest code (the q31 oracle's CASE chain), <= 0.05 defaulting "en". */
  def lang_id_pick(text: Column, toks: Column, scores: Column): Column = {
    val gmax = array_max(scores)
    val byCodeDesc = stopProfiles.map(_._1).zipWithIndex
      .map { case (lang, i) => (lang, i + 1) }.sortBy(_._1).reverse
    val argmax = byCodeDesc.foldRight(lit("de"): Column) { case ((lang, idx), acc) =>
      when(element_at(scores, idx) === gmax, lang).otherwise(acc)
    }
    val stopLang = when(size(toks) === 0, "und")
      .when(gmax <= 0.05, "en")
      .otherwise(argmax)
    when(text.isNull || length(text) === 0, "und")
      .otherwise(coalesce(script_vote(text), stopLang))
  }

  /** Heuristic language identifier: Unicode-script vote, then stopword
    * profiles for Latin-script languages. Returns ISO-639-1 code or "und".
    *
    * All-native except the per-char script vote (a codegen kernel) — no
    * per-row boxing UDF. This single-Column convenience form re-tokenizes
    * per score reference; hot paths should use the layered form
    * ([[graft.operators.TextPipeline.languages]]): project tokens, then
    * scores, then the pick, so each is computed once per row. */
  def lang_id(text: Column): Column = {
    val toks = tokenize(text)
    lang_id_pick(text, toks, lang_id_scores(toks))
  }

  /** Register the SQL-callable subset with the session function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "internal")
    reg.createOrReplaceTempFunction("l2_distance_squared", es => L2DistanceSquared(es(0), es(1)), "internal")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "internal")
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "internal")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es(0)), "internal")
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es(0)), "internal")
  }
}
