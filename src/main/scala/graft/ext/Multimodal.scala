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

  /** A parsed image header (None fields for unrecognized payloads). */
  case class ImageHeader(
      doc_id: Long,
      format: Option[String],
      width: Option[Int],
      height: Option[Int])

  /** Codec-free image header parse — REAL format sniffing, not a stub:
    * PNG IHDR (big-endian dims at offsets 16/20 after the 8-byte
    * magic), GIF87a/89a logical screen descriptor (little-endian
    * uint16 at 6/8), BMP BITMAPINFOHEADER (little-endian int32 at
    * 18/22). Dimensions and format come straight from the container
    * bytes, so "extract image metadata at lake scale" needs no codec
    * library at all; only pixel DECODE remains the documented stub in
    * [[decodeFeatures]]. */
  def parseImageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be32(o: Int): Int = (u(o) << 24) | (u(o + 1) << 16) | (u(o + 2) << 8) | u(o + 3)
    def le16(o: Int): Int = u(o) | (u(o + 1) << 8)
    def le32(o: Int): Int = u(o) | (u(o + 1) << 8) | (u(o + 2) << 16) | (u(o + 3) << 24)
    if (bytes.length >= 24 &&
      u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
      u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a)
      Some(("png", be32(16), be32(20)))
    else if (bytes.length >= 10 &&
      u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
      (u(4) == '7' || u(4) == '9') && u(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (bytes.length >= 26 && u(0) == 'B' && u(1) == 'M')
      Some(("bmp", le32(18), le32(22)))
    else None
  }

  /** Header metadata for every payload — same mapPartitions batch shape
    * as [[decodeFeatures]], but backed by the real parser. Unrecognized
    * payloads (the corpus's text bytes included) surface as None rather
    * than erroring: a lake-scale metadata sweep must not die on the
    * first corrupt blob. */
  def imageHeaders(spark: SparkSession, withPayloads: DataFrame): Dataset[ImageHeader] = {
    import spark.implicits._
    withPayloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseImageHeader(bytes) match {
          case Some((f, w, h)) => ImageHeader(id, Some(f), Some(w), Some(h))
          case None => ImageHeader(id, None, None, None)
        }
      })
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
