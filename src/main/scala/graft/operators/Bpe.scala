package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions._

/** Byte-pair-encoding tokenizer training + encoding over a documents
  * table (Sennrich et al. ACL'16) — the tokenizer-fitting step of a
  * training-data pipeline, and the basis for accurate token budgeting
  * ([[TextPipeline.tokenBudgetSample]] / [[TextPipeline.packSequences]]
  * count whitespace tokens; a fitted BPE counts model tokens).
  *
  * Scale shape — the standard two-level decomposition every production
  * BPE trainer uses (merge statistics depend only on the WORD-FREQUENCY
  * table, never on document boundaries):
  *
  *  1. Distributed word counting: one vocab-keyed shuffle (partial aggs
  *     shrink it to |V| rows), then a bounded top-`maxWords` collect —
  *     the same bounded-sample posture as k-means training (at 100 TB
  *     the head of the word distribution IS the statistically-correct
  *     training input; tail hapaxes cannot win a merge).
  *  2. Driver merge loop over the collected (word, count) dict —
  *     O(maxWords · avgWordLen) per iteration, independent of corpus
  *     size. Deterministic: argmax by (count desc, pair lexicographic).
  *  3. Map-only encoding: the merge ranks broadcast to every task; each
  *     partition memoizes word → token-count (Zipf makes the hit rate
  *     ~99%), so the corpus is encoded in one narrow pass.
  *
  * Tokenization matches the engine's `tokenize` (lowercase whitespace
  * split); words end with the `</w>` boundary marker so merges cannot
  * cross word boundaries (the reference formulation). */
object Bpe {

  val EndOfWord = "</w>"

  /** A fitted tokenizer: merges in rank order (lower rank = applied
    * earlier = more frequent at fit time). */
  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy BPE encode of one word: start from characters + `</w>`,
      * repeatedly merge the present pair with the LOWEST rank. */
    def encodeWord(word: String): Seq[String] = {
      var syms = word.map(_.toString) :+ EndOfWord
      var done = syms.length < 2
      while (!done) {
        var best = -1
        var bestAt = -1
        var i = 0
        while (i < syms.length - 1) {
          ranks.get((syms(i), syms(i + 1))) match {
            case Some(r) if best == -1 || r < best => best = r; bestAt = i
            case _ =>
          }
          i += 1
        }
        if (best == -1) done = true
        else {
          // merge every occurrence of the chosen pair, left to right
          val pair = (syms(bestAt), syms(bestAt + 1))
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
              out += pair._1 + pair._2; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          if (syms.length < 2) done = true
        }
      }
      syms
    }

    /** Subword vocabulary implied by the merges (single chars excluded —
      * callers union the byte/char alphabet of their corpus). */
    def vocabulary: Seq[String] = merges.map { case (a, b) => a + b }.distinct
  }

  /** Fit `numMerges` BPE merges on the corpus word-frequency table.
    *
    * `maxWords` bounds the driver-side dict (top by count desc, word asc
    * — a deterministic bounded collect, the k-means-sample pattern). */
  def train(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      maxWords: Int = 100000): Model = {
    val counts = wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    Model(trainFromCounts(counts, numMerges))
  }

  /** The distributed stage of [[train]]: corpus word frequencies,
    * `[word, cnt]` — one vocab-keyed shuffle. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    Gen.explodeOnce(Par.ensure(docs), Seq.empty,
      ngram_counts(tokenize(col(textCol)), 1), "tc")
      .groupBy(col("tc.term").as("word"))
      .agg(sum(col("tc.tf")).cast("long").as("cnt"))

  /** The driver stage of [[train]], exposed for spec-level determinism
    * checks: the classic dict-rewrite merge loop. */
  def trainFromCounts(counts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var dict: Seq[(Array[String], Long)] =
      counts.map { case (w, c) => ((w.map(_.toString) :+ EndOfWord).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        dict = dict.map { case (syms, c) =>
          if (!syms.indices.init.exists(i => syms(i) == best._1 && syms(i + 1) == best._2)) (syms, c)
          else {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += best._1 + best._2; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), c)
          }
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Per-word greedy-encode length table `[word, n_sub]` — the model's
    * word → subword-count function materialized over a word set (e.g.
    * [[wordCounts]] output). Map-only, model broadcast with the closure.
    * q73 persists this as its oracle artifact: DuckDB then replays the
    * whole distributed encode pass (explode → join → sum) over the same
    * bytes, leaving only the per-word greedy loop spec-gated (BpeSpec's
    * ACL'16 worked example). */
  def wordSubwordCounts(
      words: DataFrame,
      model: Model,
      wordCol: String = "word"): DataFrame = {
    val in = Par.ensure(words).select(col(wordCol).cast("string").as("word"))
    val outSchema = StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("n_sub", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val w = r.getString(0)
        Row(w, model.encodeWord(w).length.toLong)
      }
    }(enc)
  }

  /** Map-only corpus encoding: `[id, n_tokens_ws, n_bpe_tokens]` per doc.
    * The model broadcasts with the task closure; each partition memoizes
    * word → subword count. */
  def encodeCounts(
      docs: DataFrame,
      model: Model,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val in = Par.ensure(docs)
      .select(col(idCol).cast("long").as("id"), tokenize(col(textCol)).as("toks"))
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens_ws", LongType, nullable = false),
      StructField("n_bpe_tokens", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      // bounded clear-on-full memo (the stem-cache posture): Zipf makes
      // the hit rate ~99%, but an adversarial vocabulary must not grow
      // task memory without bound
      val memoCap = 1 << 20
      val memo = collection.mutable.HashMap.empty[String, Long]
      rows.map { r =>
        val toks = r.getSeq[String](1)
        var bpe = 0L
        toks.foreach { w =>
          bpe += memo.getOrElse(w, {
            if (memo.size >= memoCap) memo.clear()
            val v = model.encodeWord(w).length.toLong
            memo.update(w, v)
            v
          })
        }
        Row(r.getLong(0), toks.length.toLong, bpe)
      }
    }(enc)
  }
}
