package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Incremental

/** STREAMING incremental JOIN-view maintenance — `mv_refresh_join`'s
  * batch IVM (classic delta decomposition, [[Incremental
  * .deltaJoinTerms]]) driven from `foreachBatch`, so each micro-batch
  * folds its delta quadrants into a standing join view as it arrives.
  * This is the reference's nightly full re-extract
  * (spark-jobs/timescale_to_deltalake.py:29-37 re-reads BOTH tables
  * every run) upgraded twice: incremental instead of full, continuous
  * instead of nightly.
  *
  * One tagged CDC-shaped stream carries changes to both join sides
  * (the Debezium/outbox convention); each micro-batch splits into
  * (ΔA, ΔB) and the view merges partials of ΔA⋈B_old, A_old⋈ΔB and
  * ΔA⋈ΔB. The A_old⋈B_old quadrant — the nightly job's dominant cost
  * — is NEVER recomputed.
  *
  * 100 TB shape: the view is keys-cardinality-sized; every delta term
  * has a Δ-sized side (ΔA⋈B_old shuffles only ΔA; A_old⋈ΔB broadcasts
  * the tiny ΔB so history pays one pruned scan, never a shuffle). The
  * history frames here are unions of per-batch `localCheckpoint`
  * deltas — the single-JVM stand-in for the persisted bronze tables a
  * cluster deployment would append to (and the view for its silver
  * table); the maintenance ALGEBRA is identical. Micro-batch replays
  * (foreachBatch is at-least-once) are guarded by the batchId
  * high-water mark: add-merge is not idempotent, so a replayed batch
  * must be skipped, mirroring the reference's ON CONFLICT sinks.
  */
object JoinView {

  /** Mutable handle over the standing state; `view` is view-shaped
    * partials (keys*, n, sum_v, min_v, max_v — [[Incremental
    * .partials]]) after every completed micro-batch. */
  final class Handle private[stream] () {
    @volatile private[stream] var viewPartials: DataFrame = _
    private[stream] var aDeltas: Vector[DataFrame] = Vector.empty
    private[stream] var bDeltas: Vector[DataFrame] = Vector.empty
    private[stream] var lastBatchId: Long = -1L
    def view: DataFrame = viewPartials
  }

  /** Start maintaining a join view over a tagged change stream.
    *
    * @param tagged streaming frame carrying both sides' changes
    * @param splitA extract this batch's A-side (fact) rows
    * @param splitB extract this batch's B-side (dim) rows
    * @param join   the view's join (plain inner join of the two sides)
    * @param keys   view grouping keys (post-join column names)
    * @param value  measure aggregated by the view
    * @param scale  exact-decimal scale for the sum ([[Incremental.partials]])
    */
  def maintain(
      tagged: DataFrame,
      splitA: DataFrame => DataFrame,
      splitB: DataFrame => DataFrame,
      join: (DataFrame, DataFrame) => DataFrame,
      keys: Seq[String],
      value: String,
      scale: Int,
      checkpointDir: String,
      availableNow: Boolean = true): (StreamingQuery, Handle) = {
    val h = new Handle()
    def hist(ds: Vector[DataFrame], empty: DataFrame): DataFrame =
      if (ds.isEmpty) empty else ds.reduce(_.unionByName(_))
    val writer = tagged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > h.lastBatchId) {
          batch.persist()
          try {
            // Eager checkpoints: the deltas become owned, lineage-free
            // blocks (the bronze-append seam) before they enter the
            // history unions — without this, batch N's view would
            // re-derive every prior batch through the streaming source.
            val dA = splitA(batch).localCheckpoint(true)
            val dB = splitB(batch).localCheckpoint(true)
            val aOld = hist(h.aDeltas, dA.limit(0))
            val bOld = hist(h.bDeltas, dB.limit(0))
            def jp(x: DataFrame, y: DataFrame) =
              Incremental.partials(join(x, y), keys, value, scale)
            val terms = Incremental.deltaJoinTerms(aOld, dA, bOld, dB, jp)
            val merged = (Option(h.viewPartials).toSeq ++ terms)
              .reduce(Incremental.merge(_, _, keys))
            h.viewPartials = merged.localCheckpoint(true)
            h.aDeltas :+= dA
            h.bDeltas :+= dB
            h.lastBatchId = batchId
          } finally {
            batch.unpersist()
            ()
          }
        }
      }
    val q = (if (availableNow) writer.trigger(Trigger.AvailableNow())
             else writer).start()
    (q, h)
  }
}
