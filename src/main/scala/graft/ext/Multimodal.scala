package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode / feature-extract / frame-sample operators
  * (SURVEY §7.5).
  *
  * Decode is layered by what this environment can really run:
  * [[parseImageHeader]] (container-byte header parse) and
  * [[decodePixelFeatures]] (`javax.imageio` — in the JDK, no codec jar)
  * are REAL; only formats imageio lacks (video, audio, webp, ...) stay
  * behind the clearly-marked deterministic STUB in [[decodeFeatures]].
  * The Spark-side plumbing is identical for all three: binary column +
  * metadata struct schema, `mapPartitions` batch shape (the Scala
  * analog of `mapInPandas`: one iterator per partition, codec setup
  * amortized across the batch), and partition sizing notes. At 100 TB
  * the payload column dominates I/O: keep it in its own parquet column
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

  /** A really-decoded image's pixel-level features. */
  case class PixelFeatures(
      doc_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      n_pixels: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
      argb_crc: Long)

  /** REAL pixel decode — `javax.imageio` ships with the JDK (PNG, GIF,
    * BMP, JPEG readers), so no codec jar is needed: payload bytes →
    * BufferedImage → row-major ARGB ints. Returns None for anything
    * imageio cannot decode (those formats remain the documented stub
    * path in [[decodeFeatures]]); a corrupt blob must never kill a
    * lake-scale sweep. */
  def decodePixelsKernel(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // getRGB normalizes every source color model to packed ARGB —
        // the decode contract downstream features depend on.
        Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Exception => None }

  /** Pixel features for every payload through the same batched seam as
    * [[decodeFeatures]] — but with the REAL decoder. Pixel arrays never
    * leave the task: only fixed-width features (dims, channel means,
    * ARGB checksum) cross the shuffle, so the operator's output is
    * O(rows) however large the images are. */
  def decodePixelFeatures(spark: SparkSession, withPayloads: DataFrame): Dataset[PixelFeatures] = {
    import spark.implicits._
    withPayloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition (not per-row) codec setup: no imageio disk
        // cache — a 100 TB sweep must not write a temp file per image.
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, bytes) =>
          decodePixelsKernel(bytes) match {
            case Some((w, h, px)) =>
              var r = 0L; var g = 0L; var b = 0L
              var crc = 1469598103934665603L // FNV-1a over ARGB ints
              var i = 0
              while (i < px.length) {
                val p = px(i)
                r += (p >>> 16) & 0xff; g += (p >>> 8) & 0xff; b += p & 0xff
                var k = 0
                while (k < 4) {
                  crc = (crc ^ ((p >>> (8 * k)) & 0xffL)) * 1099511628211L
                  k += 1
                }
                i += 1
              }
              val n = px.length.toLong.max(1L)
              PixelFeatures(id, decoded = true, w, h, px.length.toLong,
                r.toDouble / n, g.toDouble / n, b.toDouble / n, crc)
            case None =>
              PixelFeatures(id, decoded = false, 0, 0, 0L, 0.0, 0.0, 0.0, 0L)
          }
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
