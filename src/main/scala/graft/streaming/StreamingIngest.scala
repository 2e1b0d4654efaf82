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
  * Exactly-once: foreachBatch may retry an epoch after a crash. The ops
  * batch id is `base + 2*epochId` in the odd (streaming-reserved) id
  * lane, with `base` allocated once per checkpoint (persisted next to
  * it), so a retried epoch overwrites its own batch directory —
  * idempotent replay, never append-duplication, and never a collision
  * with a manually inserted (even-lane) batch.
  */
object StreamingIngest {

  /** Attach a streaming DataFrame of insert rows (collection row schema)
    * to the collection. Caller owns the returned query's lifecycle. */
  def start(
      rows: DataFrame,
      coll: Collection,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    // Allocate the ops-batch base ONCE per checkpoint and persist it there:
    // a restarted query re-reads the same base, so epoch N always maps to
    // the same ops/batch=<base + 2N> directory across retries. The odd id
    // lane is reserved for streaming (manual inserts use even ids), so an
    // epoch overwrite can never clobber a manually inserted batch.
    val ckDir = java.nio.file.Paths.get(checkpoint)
    java.nio.file.Files.createDirectories(ckDir)
    val baseFile = ckDir.resolve("graft_ops_base")
    val base: Long =
      if (java.nio.file.Files.exists(baseFile))
        java.nio.file.Files.readString(baseFile).trim.toLong
      else {
        val b = coll.nextStreamingBase()
        java.nio.file.Files.writeString(baseFile, b.toString)
        b
      }
    // pending-op counter for the auto-flush policy (R3); process-local is
    // fine — a restart just flushes early.
    val pending = new java.util.concurrent.atomic.AtomicLong(0L)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          coll.insertAt(base + 2 * epochId, batch)
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
