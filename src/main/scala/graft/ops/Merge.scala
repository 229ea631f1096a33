package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC merge — apply a keyed changeset (inserts / updates / deletes) to
  * a snapshot: the batch engine's analog of lake `MERGE INTO`
  * (Delta/Iceberg upsert; the reference's nightly overwrite ETL —
  * timescale_to_deltalake.py:37 — is the degenerate full-refresh form
  * of the same maintenance contract, so this is the incremental
  * capability a user migrating off it needs next).
  *
  * Plan shape (100 TB): a changeset is a day's churn — orders of
  * magnitude smaller than the snapshot — so updates/deletes apply as a
  * BROADCAST left join against the snapshot scan (the snapshot never
  * shuffles; a full-outer join would force both sides through an
  * exchange and is exactly what this operator avoids), and inserts
  * union in afterwards. Combined with partition pruning on the
  * snapshot's layout (year/month/day — io.Sinks), only touched
  * partitions need rewriting on the write side.
  *
  * Semantics: 'U' rows replace payload columns, 'D' rows drop the key,
  * 'I' rows append (caller guarantees insert keys are not present —
  * the upsert form routes existing keys through 'U'). Unmatched
  * snapshot rows pass through unchanged.
  */
object Merge {

  /** @param snapshot current table state
    * @param changes  changeset holding `key`, `op` ('I'/'U'/'D'), and
    *                 the same payload columns as `snapshot`
    * @param key      join key column name
    * @param payload  payload column names replaced by 'U' and supplied
    *                 by 'I'
    * @return merged table: key, payload*, row_status
    *         ('kept'/'updated'/'inserted')
    */
  def apply(snapshot: DataFrame, changes: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    val ch = broadcast(changes.select(
      col(key) +: col("op") +: payload.map(c => col(c).as(s"__new_$c")): _*))
    val merged = snapshot.join(ch, Seq(key), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        col(key) +:
          payload.map(c =>
            when(col("op") === "U", col(s"__new_$c")).otherwise(col(c)).as(c)) :+
          when(col("op") === "U", lit("updated")).otherwise(lit("kept"))
            .as("row_status"): _*)
    val inserts = changes.filter(col("op") === "I")
      .select(col(key) +: payload.map(col) :+ lit("inserted").as("row_status"): _*)
    merged.unionByName(inserts)
  }

  /** Streaming CDC apply — maintain a parquet snapshot from a stream of
    * change rows (the streaming half of lake `MERGE INTO`): each
    * micro-batch is compacted to its LATEST change per key (max_by over
    * the sequence column — a batch may carry several ops for one key;
    * CDC replays apply in log order), then merged via [[apply]] and the
    * snapshot overwritten.
    *
    * The read→eager-localCheckpoint→overwrite cycle materializes the
    * merged state in the block manager before any file is replaced, so
    * the overwrite never reads its own partially-written output. At
    * 100 TB the snapshot would be date/bucket-partitioned and only the
    * partitions the batch touches dynamically overwritten (io.Sinks
    * pattern); the single-directory form here is the semantics
    * contract, exercised by MergeSpec.
    *
    * Exactly-once: foreachBatch is at-least-once per batch id; the
    * merge is idempotent for a replayed batch (same latest-change set
    * produces the same snapshot), matching the engine's other
    * foreachBatch sinks (J6).
    */
  def streamApply(changes: DataFrame, key: String, payload: Seq[String],
      seq: String, snapshotDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val latest = batch.groupBy(col(key))
            .agg(max_by(struct(col("op") +: payload.map(col): _*), col(seq)).as("r"))
            .select(col(key) +: col("r.op").as("op") +:
              payload.map(c => col(s"r.$c").as(c)): _*)
          val snap = s.read.parquet(snapshotDir)
          val merged = apply(snap, latest, key, payload)
            .drop("row_status").localCheckpoint(true)
          merged.write.mode("overwrite").parquet(snapshotDir)
        }
      }
      .start()
}
