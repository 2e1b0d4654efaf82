package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.GraftFunctions._
import graft.operators.Dedup

/** Streaming near-duplicate detection — the streaming face of
  * [[graft.operators.Dedup.simhashPairs]].
  *
  * Each arriving document is sketched (64-bit simhash) and exploded to
  * its blocked-LSH band keys (the same pigeonhole construction as the
  * batch operator: any pair within `maxHamming` shares at least one
  * key). Per (chunk, key) bucket, keyed state holds the most recent
  * `maxPerBucket` (id, sketch) entries; a new arrival Hamming-verifies
  * against them and emits `[a, b, hamming]` match events (a < b) for
  * every near-duplicate found, within and across micro-batches.
  *
  * Delivery is AT-LEAST-ONCE per pair: a pair colliding in several band
  * keys emits from each (the batch operator's emit-once chunk re-check
  * can't see another bucket's pruned state here) — downstream sinks
  * dedup on (a, b), which `foreachBatch` does in one line.
  *
  * State posture at production rates: TWO bounds compose. The per-bucket
  * ring cap bounds each bucket's entry list, and the event-time horizon
  * (`eventTimeCol` + `delay`) bounds BUCKET CARDINALITY — a bucket idle
  * past the watermark horizon times out and its state is removed, so
  * total state is (buckets touched within one horizon) x (ring cap), not
  * one entry per distinct band key ever seen. The ring cap alone does NOT
  * bound aggregate memory on a long-running stream over a diverse corpus
  * (bucket count grows ~docs x band tables); always supply an event-time
  * column in production — the horizon trades away only duplicates that
  * arrive farther apart than `delay`, the same trade as
  * [[StreamingDedup]]'s watermark. Without `eventTimeCol` the bucket set
  * is unbounded — bounded backfills only. */
object StreamingNearDup {

  /** Match events for near-duplicate pairs within Hamming `maxHamming`.
    *
    * @param events       streaming DataFrame with `idCol` (long-castable)
    *                     and `textCol`
    * @param blocksPerKey 0 = the batch operator's default table count
    * @param maxPerBucket per-bucket state ring size
    * @param eventTimeCol event-time column to watermark on; empty =
    *                     unbounded bucket set (bounded backfills only)
    * @param delay        watermark delay AND bucket-idle horizon,
    *                     e.g. "10 minutes": a bucket whose newest entry
    *                     is older than the watermark by more than this
    *                     is evicted (reference has no streaming
    *                     near-dup; the posture mirrors StreamingDedup's
    *                     dropDuplicatesWithinWatermark)
    */
  def simhash(
      events: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      blocksPerKey: Int = 0,
      maxPerBucket: Int = 256,
      eventTimeCol: String = "",
      delay: String = "10 minutes"): DataFrame = {
    val withTime = eventTimeCol.nonEmpty
    val tsCol =
      if (withTime) col(eventTimeCol).cast("timestamp")
      else lit(null).cast("timestamp")
    // Project/cast BEFORE watermarking: a Cast applied after
    // withWatermark produces a fresh attribute without the watermark
    // metadata, and flatMapGroupsWithState(EventTimeTimeout) then fails
    // analysis ("Event-time timeout not supported without watermark").
    val projected = events
      .select(col(idCol).cast("long").as("id"),
        graft.functions.GraftFunctions.simhash(tokenize(col(textCol))).as("sk"),
        tsCol.as("ts"))
    fromProjected(projected, maxHamming, blocksPerKey, maxPerBucket, withTime, delay)
  }

  /** Match events over PRE-SKETCHED rows — any 64-bit sketch column, not
    * just text simhash: feed [[graft.operators.Multimodal.imageHashes]] /
    * `audioHashes` output (or a streaming map that computes them) through
    * the identical banding + keyed-state machinery for streaming IMAGE and
    * AUDIO near-dup. Same state posture and at-least-once delivery as
    * [[simhash]]. */
  def sketches(
      events: DataFrame,
      idCol: String = "id",
      skCol: String = "sk",
      maxHamming: Int = 3,
      blocksPerKey: Int = 0,
      maxPerBucket: Int = 256,
      eventTimeCol: String = "",
      delay: String = "10 minutes"): DataFrame = {
    val withTime = eventTimeCol.nonEmpty
    val tsCol =
      if (withTime) col(eventTimeCol).cast("timestamp")
      else lit(null).cast("timestamp")
    val projected = events
      .select(col(idCol).cast("long").as("id"), col(skCol).cast("long").as("sk"),
        tsCol.as("ts"))
    fromProjected(projected, maxHamming, blocksPerKey, maxPerBucket, withTime, delay)
  }

  private def fromProjected(
      projected: DataFrame,
      maxHamming: Int,
      blocksPerKey: Int,
      maxPerBucket: Int,
      withTime: Boolean,
      delay: String): DataFrame = {
    val spark = projected.sparkSession
    import spark.implicits._
    val (bandStructs, _) = Dedup.simhashBands(col("sk"), maxHamming, blocksPerKey)
    val src = if (withTime) projected.withWatermark("ts", delay) else projected
    val banded = src
      .select(col("id"), col("sk"), col("ts"), explode(array(bandStructs: _*)).as("b"))
      .select(col("b.chunk").as("chunk"), col("b.key").as("key"),
        col("id"), col("sk"), col("ts"))
      .as[(Int, Long, Long, Long, java.sql.Timestamp)]
    val timeoutConf =
      if (withTime) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (chunk, key, _, _, _) => (chunk, key) }
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Int)](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            // bucket idle past the horizon: drop its whole entry list
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
            var maxTsMs = Long.MinValue
            var touched = false
            // rows older than the current watermark neither match nor
            // re-arm the timeout: otherwise a trickle of arbitrarily
            // late rows keeps an idle bucket alive forever and the
            // horizon bound on bucket cardinality becomes best-effort
            // getCurrentWatermarkMs() returns 0 before the first watermark
            // is established — taking that 0 literally would misclassify
            // pre-epoch (negative-millis) event times as late, so 0 is
            // treated as "no watermark yet". NOTE pre-epoch rows normally
            // never get this far: Spark's FlatMapGroupsWithStateExec
            // late-row filter drops event times below the (initially 0)
            // watermark before the state function runs — pre-1970 event
            // times are unsupported with EventTimeTimeout at the Spark
            // level (StreamingSpec documents the drop); shift them or use
            // the no-event-time mode for such corpora.
            val rawWm = if (withTime) state.getCurrentWatermarkMs() else 0L
            val wmMs = if (rawWm == 0L) Long.MinValue else rawWm
            // id-sorted within the batch so output is deterministic
            // regardless of upstream row order
            rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sk, ts) =>
              val tsMs = if (ts != null) ts.getTime else Long.MaxValue
              if (tsMs >= wmMs) {
                touched = true
                if (ts != null) maxTsMs = math.max(maxTsMs, tsMs)
                seen.foreach { case (oid, osk) =>
                  if (oid != id) {
                    val h = java.lang.Long.bitCount(osk ^ sk)
                    if (h <= maxHamming)
                      out += ((math.min(oid, id), math.max(oid, id), h))
                  }
                }
                seen = (id, sk) :: seen.filterNot(_._1 == id)
                if (seen.length > maxPerBucket) seen = seen.take(maxPerBucket)
              }
            }
            // a batch of only-late rows leaves state AND the armed
            // timeout untouched, so an idle bucket fed late stragglers
            // still expires at its original horizon
            if (touched) {
              state.update(seen)
              if (withTime) {
                // evict when the watermark passes (newest entry + delay);
                // the max() keeps the timestamp legal (> current
                // watermark) even for a bucket whose newest row trails
                // the query-global watermark
                val base = math.max(maxTsMs, state.getCurrentWatermarkMs() + 1)
                state.setTimeoutTimestamp(base, delay)
              }
            }
            out.iterator
          }
      }
      .toDF("a", "b", "hamming")
  }
}
