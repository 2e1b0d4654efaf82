package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Language identification (script vote + stopword profiles). */
  def languages(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), lang_id(col(textCol)).as("lang_pred"))

  /** Content fingerprints: rolling hash (engine-native) + md5 of the
    * normalized text (cross-engine checkable). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      doc_fingerprint(col(textCol)).as("fingerprint"),
      md5(concat_ws(" ", tokenize(col(textCol)))).as("content_md5"))

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
    val withStats = docs.select(
      col(idCol).as("id"),
      md5(concat_ws(" ", tokenize(col(textCol)))).as("content_hash"),
      token_count_ws(col(textCol)).cast("long").as("n_tokens"),
      stopword_ratio(col(textCol)).as("swr"))
    val keep = withStats.groupBy("content_hash").agg(min(col("id")).as("id"))
    withStats
      .join(keep, Seq("content_hash", "id"), "left_semi")
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("swr") < maxStopwordRatio)
      .select(col("id"), col("n_tokens"))
  }
}
