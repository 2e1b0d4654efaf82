package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Benchmark decontamination — the training-data hygiene pass that flags
  * training documents overlapping an evaluation/benchmark set by shared
  * word n-grams (the standard "n-gram overlap" decontamination rule used
  * for LLM corpora; no reference counterpart — muopdb has no pipeline
  * surface).
  *
  * Candidate generation is an inverted-index join on shingle hashes —
  * never a train × bench cross product — so cost is proportional to
  * shared-shingle postings, and a hot-shingle guard caps the blowup from
  * ubiquitous n-grams (boilerplate). At 100 TB the train side streams
  * through one shuffle by shingle; the bench side is typically tiny
  * (an eval suite) and AQE broadcasts it on its own.
  */
object Decontaminate {

  /** Per-training-doc contamination report: for every train doc sharing at
    * least `minOverlap` distinct `shingleLen`-gram shingles with some bench
    * doc, returns `[doc_id, max_overlap, n_bench_hits]` — the worst
    * benchmark overlap and how many bench docs cross the threshold.
    *
    * `maxShinglePostings` drops shingles whose bench posting list exceeds
    * the cap (ubiquitous n-grams add candidates and inflate every overlap
    * equally; dropping them only shrinks computed overlaps — same
    * recall-on-hot-keys trade as [[Dedup.ngramJaccardPairs]]). */
  def overlapReport(
      train: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleLen: Int = 3,
      minOverlap: Int = 5,
      maxShinglePostings: Int = 10000): DataFrame = {
    def postings(docs: DataFrame, as: String) = Gen.explodeOnce(
      Par.ensure(docs), Seq(col(idCol).as(as)),
      array_distinct(shingle_hashes(tokenize(col(textCol)), shingleLen)), "sh")
    val trainPost = postings(train, "doc_id")
    val benchPost = postings(bench, "bench_id")
    val guarded =
      if (maxShinglePostings > 0)
        benchPost.withColumn("cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("sh")))
          .filter(col("cnt") <= maxShinglePostings)
          .drop("cnt")
      else benchPost
    trainPost.join(guarded, Seq("sh"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
      .groupBy("doc_id")
      .agg(max(col("overlap")).as("max_overlap"),
        count(lit(1)).as("n_bench_hits"))
  }

  /** The cleaning counterpart: training rows NOT flagged by
    * [[overlapReport]] (left_anti on the contaminated id set). */
  def clean(
      train: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleLen: Int = 3,
      minOverlap: Int = 5,
      maxShinglePostings: Int = 10000): DataFrame =
    train.join(
      overlapReport(train, bench, idCol, textCol, shingleLen, minOverlap, maxShinglePostings)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")
}
