package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.io.Snapshot

/** Exactly-once streaming writes into the snapshot lake — the Delta
  * transactional-sink semantic (`txn` action) on graft's commit log.
  *
  * Structured Streaming's foreachBatch contract is AT-LEAST-once: after
  * a restart the engine re-delivers the last micro-batch whose sink
  * commit it cannot prove. A plain `lake.append` inside foreachBatch
  * would therefore double-write that batch. [[Snapshot.Lake
  * .appendIdempotent]] closes the gap: every commit is stamped with
  * (writerId, batchId), and a re-delivered batch — recognized by
  * `batchId <= lastTxn(writerId)` — is skipped, making the LAKE the
  * source of truth for what landed (the sink-side half of the V2
  * connector's exactly-once story, reference
  * timescale_to_deltalake.py:33-37's streaming-write shape).
  *
  * 100 TB shape: the idempotence probe is a log read (file-count-sized,
  * no data scan); each micro-batch commit writes only its own files and
  * one log record, so sink cost rides the increment, never the table.
  */
object SnapshotSink {

  /** Attach `stream` to `lake` as an exactly-once append sink. Empty
    * micro-batches commit nothing (no empty table versions); skipping
    * them is replay-safe because batchIds are monotone per writer and
    * the replay probe compares against the MAX stamped id. */
  def attach(stream: DataFrame, lake: Snapshot.Lake, writerId: String,
      checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val base = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    trigger.fold(base)(base.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          lake.appendIdempotent(batch, writerId, batchId)
          ()
        }
      }
      .start()
  }

  /** Attach a CDC-shaped stream (rows tagged `_op` 'upsert' |
    * 'delete') as an exactly-once MERGE sink — the Delta "MERGE in
    * foreachBatch" pattern on [[Snapshot.Lake.applyCdcMor]]: each
    * micro-batch DV-masks its keys' old versions and appends the
    * upserts as one txn-stamped commit; a restart's re-delivered
    * batch is skipped against the log. The streaming upsert never
    * rewrites a data file (merge-on-read), so per-batch sink cost is
    * O(batch + matches + manifest) at any table size. */
  def attachCdc(stream: DataFrame, lake: Snapshot.Lake, keyCol: String,
      writerId: String, checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val base = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    trigger.fold(base)(base.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          lake.applyCdcMor(batch, keyCol, writerId, batchId)
          ()
        }
      }
      .start()
  }
}
