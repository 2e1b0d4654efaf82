package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Streaming deduplication for continuous ingest pipelines — the
  * streaming face of [[graft.operators.Dedup.exact]].
  *
  * `exact` keeps the first-seen occurrence of each normalized content
  * hash. State is Spark's streaming dedup store; with a watermark column
  * supplied, state for hashes older than the watermark horizon is
  * dropped (bounded state, the 100-TB posture — an unbounded-state dedup
  * is a memory leak at production ingest rates), trading exactness for
  * duplicates that arrive farther apart than the horizon. Without a
  * watermark the state is exact and unbounded — only for bounded
  * backfills.
  *
  * Emits the surviving rows with their `content_hash`, so a downstream
  * `foreachBatch` can land them straight into a
  * [[graft.core.Collection]] or a parquet sink. */
object StreamingDedup {

  /** Normalized content hash used by both batch and streaming exact
    * dedup: whitespace/case-insensitive md5 over the token join. */
  def contentHash(textCol: Column): Column =
    md5(concat_ws(" ", tokenize(textCol)))

  /** Drop rows whose normalized text was already seen.
    *
    * @param events        streaming DataFrame with `textCol`
    * @param eventTimeCol  event-time column to watermark on; empty =
    *                      exact unbounded state (bounded backfills only)
    * @param delay         watermark delay, e.g. "10 minutes"
    */
  def exact(
      events: DataFrame,
      textCol: String = "text",
      eventTimeCol: String = "",
      delay: String = "10 minutes"): DataFrame = {
    val hashed = events.withColumn("content_hash", contentHash(col(textCol)))
    if (eventTimeCol.isEmpty) hashed.dropDuplicates("content_hash")
    else hashed
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** [[exact]] plus a standing-corpus snapshot: rows whose hash appears
    * in the static `seenHashes` frame (e.g. the persisted output of
    * [[graft.operators.Dedup.exact]] over the existing corpus) are
    * dropped BEFORE the stateful in-stream dedup — the streaming face of
    * [[graft.operators.Dedup.incrementalExact]].
    *
    * The snapshot filter is a stream-static anti-join: stateless, so the
    * snapshot's size never enters the state store; Spark re-plans the
    * static side per micro-batch, both sides keyed on the hash. The
    * in-stream stage then handles duplicates WITHIN the live stream with
    * the same watermark-bounded state as [[exact]]. */
  def exactWithSnapshot(
      events: DataFrame,
      seenHashes: DataFrame,
      textCol: String = "text",
      hashCol: String = "content_hash",
      eventTimeCol: String = "",
      delay: String = "10 minutes"): DataFrame = {
    val hashed = events.withColumn("content_hash", contentHash(col(textCol)))
      .join(seenHashes.select(col(hashCol).as("content_hash")),
        Seq("content_hash"), "left_anti")
    if (eventTimeCol.isEmpty) hashed.dropDuplicates("content_hash")
    else hashed
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
  }
}
