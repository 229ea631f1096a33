package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Drift

/** Streaming distribution-drift monitor — the online counterpart of the
  * batch `psi_drift` query: per (event_type, tumbling window), compare
  * the window's value histogram against a static REFERENCE histogram
  * (the training-period distribution) and emit an exact-integer PSI.
  * This is the alarm a serving pipeline keeps on its input features:
  * when psi_x1e6 crosses the policy threshold (industry folklore:
  * 0.1 = investigate, 0.25 = retrain), the window is flagged.
  *
  * Two-stage shape, because PSI of a window is only meaningful once the
  * window is COMPLETE:
  *  1. [[windowedHistogram]] — the only stateful stage: watermarked
  *     tumbling-window (type, bin) counts, append-mode, so a window's
  *     histogram emits exactly once, when the watermark finalizes it.
  *     State is O(types × bins) per open window, never row-scaled.
  *  2. [[psiVsReference]] — stateless per-micro-batch math over the
  *     finalized histograms (run it inside foreachBatch, the JoinView
  *     convention): full-outer join against the reference per emitted
  *     window — bins present in only one side are explicit zeros,
  *     they ARE the drift signal — then `Drift.psiFromCounts`, the
  *     byte-identical math the batch query runs. The reference is
  *     bins-sized and broadcast; nothing here shuffles more than the
  *     finalized histogram rows.
  *
  * 100 TB/firehose shape: stage 1 is one partial+final windowed agg —
  * raw events collapse to (type, window, bin) before any state write;
  * stage 2's cost rides types × bins per window, independent of rate.
  */
object DriftMonitor {

  /** Stage 1 (streaming, stateful): watermarked tumbling-window value
    * histogram. `events` must carry (event_type, event_time, value).
    * Append mode ⇒ each (type, window, bin) row emits exactly once. */
  def windowedHistogram(events: DataFrame, windowDur: String,
      watermark: String, binWidth: Double): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(col("event_type"),
        window(col("event_time"), windowDur).as("w"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("ca"))

  /** Stage 2 (batch, inside foreachBatch): PSI of each finalized
    * (type, window) histogram vs `reference` (event_type, bin, rc).
    * Output: (event_type, window_start, na, nb, n_bins, psi_x1e6). */
  def psiVsReference(hist: DataFrame, reference: DataFrame): DataFrame = {
    val windows = hist.select(col("event_type"), col("w")).distinct()
    val refBins = windows.join(reference, Seq("event_type"))
      .select(col("event_type"), col("w"), col("bin"), col("rc"))
    val cc = hist
      .join(refBins, Seq("event_type", "w", "bin"), "full_outer")
      .select(col("event_type"), col("w").getField("start").as("window_start"),
        col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("rc"), lit(0L)).as("cb"))
    Drift.psiFromCounts(cc, Seq("event_type", "window_start"))
  }

  /** Batch replica of the full monitor — the equivalence oracle the
    * spec holds the streamed output to (F3 discipline). */
  def monitorBatch(events: DataFrame, reference: DataFrame,
      windowDur: String, binWidth: Double): DataFrame = {
    val hist = events
      .groupBy(col("event_type"),
        window(col("event_time"), windowDur).as("w"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("ca"))
    psiVsReference(hist, reference)
  }

  // ---- exact KS variant (beside the banded PSI) -----------------------

  /** Stage 1 for the KS monitor: watermarked tumbling-window VALUE
    * distribution over the centi-quantized domain (quantization bounds
    * per-window distinct values — the ks_drift scale move; the
    * reference must be built on the same axis). State is
    * O(types × distinct centi-values) per open window. */
  def windowedValues(events: DataFrame, windowDur: String,
      watermark: String): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(col("event_type"),
        window(col("event_time"), windowDur).as("w"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
      .agg(count(lit(1)).as("ca"))

  /** Stage 2 (inside foreachBatch): exact two-sample KS of each
    * finalized (type, window) distribution vs `reference`
    * (event_type, vc, rc) — `Drift.ksFromCounts`, the byte-identical
    * math the batch ks_drift query runs. Unlike PSI no smoothing is
    * needed: one-sided values enter the cumulative gap exactly.
    * Output: (event_type, window_start, na, nb, d_num, d_x1e6). */
  def ksVsReference(vals: DataFrame, reference: DataFrame): DataFrame = {
    val windows = vals.select(col("event_type"), col("w")).distinct()
    val refVals = windows.join(reference, Seq("event_type"))
      .select(col("event_type"), col("w"), col("vc"), col("rc"))
    val cc = vals
      .join(refVals, Seq("event_type", "w", "vc"), "full_outer")
      .select(col("event_type"), col("w").getField("start").as("window_start"),
        col("vc").as("value"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("rc"), lit(0L)).as("cb"))
    Drift.ksFromCounts(cc, Seq("event_type", "window_start"))
  }

  /** Batch replica of the KS monitor (the spec's equivalence oracle). */
  def monitorKsBatch(events: DataFrame, reference: DataFrame,
      windowDur: String): DataFrame = {
    val vals = events
      .groupBy(col("event_type"),
        window(col("event_time"), windowDur).as("w"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
      .agg(count(lit(1)).as("ca"))
    ksVsReference(vals, reference)
  }
}
