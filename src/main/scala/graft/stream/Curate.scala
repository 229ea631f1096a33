package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{QualityFilter, TextOps}

/** Streaming document curation — the corpus pipeline's map-side stages
  * composed as ONE Structured Streaming flow over a document stream:
  *
  *   quality filter → PII scrub → exactly-once content dedup →
  *   decontamination (eval-fingerprint anti-join)
  *
  * This is the ingest-time counterpart of the batch `corpus_pipeline`
  * capstone: a crawler/firehose delivers documents continuously, and
  * everything that CAN be decided per-document is decided before the
  * lake write, so the nightly batch passes (MinHash near-dup, CC,
  * packing) start from a pre-cleaned bronze table.
  *
  * Scale/state shape, stage by stage:
  *  - quality filter + PII scrub: pure codegen'd Column expressions
  *    (QualityFilter.keep / TextOps.scrubPii) — zero state, ride the
  *    micro-batch scan at any rate;
  *  - content dedup: `dropDuplicatesWithinWatermark` on the md5
  *    fingerprint of the SCRUBBED text (two docs differing only in a
  *    scrubbed email are the same document) — state holds one row per
  *    distinct fingerprint only until the watermark passes it, so
  *    producer retries and crawl re-fetches drop without unbounded
  *    state (the classic dropDuplicates would grow forever);
  *  - decontamination: stream-static LEFT ANTI join against the eval
  *    fingerprint table, broadcast — benchmark-sized, the stream side
  *    never shuffles for it.
  *
  * Scrub-before-fingerprint is load-bearing: retries that differ only
  * inside PII spans still dedup, and no raw PII ever reaches the
  * dedup state store or the sink.
  */
object Curate {

  /** The streaming flow. `docs` must carry (doc_id, text, event_time).
    * Exact-dup retries arriving within `watermark` of the original are
    * dropped; eval-set members never reach the sink. */
  def curate(docs: DataFrame, evalFingerprints: DataFrame,
      watermark: String = "10 seconds"): DataFrame =
    docs
      .withWatermark("event_time", watermark)
      .filter(QualityFilter.keep(col("text")))
      .withColumn("text", TextOps.scrubPii(col("text")))
      .withColumn("fp", TextOps.contentFingerprint(col("text")))
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .join(broadcast(evalFingerprints), Seq("fp"), "left_anti")

  /** The batch replica of the same stages — the equivalence oracle the
    * spec holds the stream output to (F3 discipline: batch ≡ stream on
    * the same input). */
  def curateBatch(docs: DataFrame, evalFingerprints: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .filter(QualityFilter.keep(col("text")))
      .withColumn("text", TextOps.scrubPii(col("text")))
      .withColumn("fp", TextOps.contentFingerprint(col("text")))
      // deterministic representative per fingerprint — the FIRST
      // arrival, exactly what the stream's watermark dedup keeps (a
      // bare dropDuplicates picks an arbitrary row, which breaks any
      // doc_id-level stream ≡ batch comparison downstream)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("event_time"), col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
      .join(broadcast(evalFingerprints), Seq("fp"), "left_anti")
  }

  /** [[curate]] extended with the batch pipeline's defining stage
    * brought in-stream: MinHash near-dup dedup via banded-LSH keyed
    * state (see [[NearDup]]) — a near-duplicate (not just an exact
    * retry) arriving within the state TTL of its original is dropped
    * before the lake write. Requires the RocksDB state store
    * provider. */
  def curateNearDup(docs: DataFrame, evalFingerprints: DataFrame,
      watermark: String = "10 seconds", threshold: Double = 0.5,
      retentionMs: Long = 600000L,
      maxPerBucket: Int = graft.ext.Dedup.MaxBandBucket): DataFrame =
    NearDup.dedupNearDups(curate(docs, evalFingerprints, watermark),
      threshold, retentionMs, maxPerBucket)

  /** The batch replica of [[curateNearDup]] (the stream ≡ batch
    * equivalence gate's oracle side). */
  def curateNearDupBatch(docs: DataFrame, evalFingerprints: DataFrame,
      threshold: Double = 0.5): DataFrame =
    NearDup.dedupNearDupsBatch(curateBatch(docs, evalFingerprints),
      threshold)
}
