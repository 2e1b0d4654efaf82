package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Collection

/** Streaming ingestion: the Spark-native rebuild of the reference's
  * WAL -> ingestion-worker -> auto-flush path (SURVEY §2.9).
  *
  * Mapping:
  *  - WAL group commit (R1, core.rs:537-747)  -> micro-batch trigger;
  *    the streaming checkpoint/offset log replaces the WAL file format
  *    (S5) and gives replay-from-seq-no (R7) for free.
  *  - ingestion workers (R2)                  -> `foreachBatch` append
  *  - auto-flush policy (R3, core.rs:484-536) -> flush when pending rows
  *    since the last flush reach `maxPendingOps`
  *  - flush = segment swap (R4)               -> `Collection.flush()`
  *    (atomic TOC bump; readers on old snapshots unaffected)
  *  - read-your-writes (R5)                   -> un-flushed batches are
  *    served by the snapshot's brute-force tail
  * Exactly-once: foreachBatch may retry a batch after a crash; the ops
  * batch id makes the append idempotent per epoch (overwrite-by-batch).
  */
object StreamingIngest {

  /** Attach a streaming DataFrame of insert rows (collection row schema)
    * to the collection. Caller owns the returned query's lifecycle. */
  def start(
      rows: DataFrame,
      coll: Collection,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    // pending-op counter for the auto-flush policy (R3); process-local is
    // fine — a restart just flushes early.
    val pending = new java.util.concurrent.atomic.AtomicLong(0L)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          coll.insert(batch)
          val n = pending.addAndGet(batch.count())
          if (n >= coll.config.maxPendingOps) {
            coll.flush()
            pending.set(0L)
            // background optimizer cadence (M3): compact opportunistically
            // after each flush, like the reference's auto-optimizer loop
            // (rs/index_server/src/main.rs:202-222)
            coll.maybeCompact()
          }
        }
        ()
      }
      .start()
  }
}
