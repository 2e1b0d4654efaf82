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
  * State posture at production rates: the per-bucket ring cap bounds
  * memory regardless of runtime (an unbounded bucket is a memory leak,
  * same argument as [[StreamingDedup]]'s watermark) — duplicates farther
  * apart than `maxPerBucket` arrivals IN THE SAME BUCKET are missed,
  * which for honest radii means only pathological template buckets
  * degrade, exactly the buckets the batch operator's `maxBucket` guard
  * drops entirely. */
object StreamingNearDup {

  /** Match events for near-duplicate pairs within Hamming `maxHamming`.
    *
    * @param events       streaming DataFrame with `idCol` (long-castable)
    *                     and `textCol`
    * @param blocksPerKey 0 = the batch operator's default table count
    * @param maxPerBucket per-bucket state ring size
    */
  def simhash(
      events: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      blocksPerKey: Int = 0,
      maxPerBucket: Int = 256): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (bandStructs, _) = Dedup.simhashBands(col("sk"), maxHamming, blocksPerKey)
    val banded = events
      .select(col(idCol).cast("long").as("id"),
        graft.functions.GraftFunctions.simhash(tokenize(col(textCol))).as("sk"))
      .select(col("id"), col("sk"), explode(array(bandStructs: _*)).as("b"))
      .select(col("b.chunk").as("chunk"), col("b.key").as("key"), col("id"), col("sk"))
      .as[(Int, Long, Long, Long)]
    banded
      .groupByKey { case (chunk, key, _, _) => (chunk, key) }
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          // id-sorted within the batch so output is deterministic
          // regardless of upstream row order
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sk) =>
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
          state.update(seen)
          out.iterator
      }
      .toDF("a", "b", "hamming")
  }
}
