package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode / feature-extract / frame-sample operators
  * (SURVEY §7.5).
  *
  * The image/audio codec libraries are not in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing is real: binary column + metadata struct schema,
  * `mapPartitions` batch shape (the Scala analog of `mapInPandas`:
  * one iterator per partition, decode amortized across the batch, no
  * per-row JNI/codec setup), and partition sizing notes. At 100 TB the
  * payload column dominates I/O: keep it in its own parquet column
  * (column pruning skips it unless selected) and size
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits
  * the executor decode buffer.
  */
object Multimodal {

  /** A decoded media frame's features (what a real decoder would emit). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      format: String,
      checksum: Long)

  /** Attach an opaque binary payload + metadata columns to a frame.
    * (Test corpus has no real media, so the payload is the UTF-8 text
    * bytes — the schema/partitioning shape is what's exercised.) */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        lit("fake/raw").as("format")).as("media_meta"))

  /** Batched "decode": one pass per partition over (doc_id, payload).
    *
    * STUB decode kernel — a real implementation would hand the batch to
    * an image/audio codec here. The stub derives deterministic fake
    * dimensions from the byte length and a checksum from the bytes, so
    * the full pipeline (schema, batching, downstream aggregation) is
    * testable end-to-end.
    */
  def decodeFeatures(spark: SparkSession, withPayloads: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real codec init would happen once per partition, here:
        batch.map { case (id, bytes) =>
          val n = bytes.length.toLong
          // -- STUB: deterministic fake of a decoded frame ------------
          val width = (n % 64L).toInt + 1
          val height = (n % 48L).toInt + 1
          var ck = 1469598103934665603L // FNV-1a over payload bytes
          var i = 0
          while (i < bytes.length) {
            ck = (ck ^ (bytes(i) & 0xffL)) * 1099511628211L
            i += 1
          }
          // -----------------------------------------------------------
          MediaFeatures(id, n, width, height, "fake/raw", ck)
        }
      }
  }

  /** Frame sampling: every `stride`-th byte-window of the payload stands
    * in for a video frame (slice is a per-row built-in — no shuffle). */
  def sampleFrames(withPayloads: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val step = frameBytes * stride
    val lastFrame = floor((octet_length(col("payload")) - 1) / lit(step)).cast("long")
    withPayloads.select(
      col("doc_id"),
      posexplode(
        transform(
          sequence(lit(0L), greatest(lastFrame, lit(0L))),
          i => col("payload").substr((i * step + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_idx", "frame_bytes")))
  }
}
