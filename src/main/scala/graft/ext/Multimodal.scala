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

  /** Deterministic synthetic 24-bit BMP (w×h, BITMAPINFOHEADER): pixel
    * colors derive from splitmix64(seed, index), so the SAME seed
    * always yields byte-identical images in any environment — the
    * plant generator for the image near-dup gate. `tweakBlue` bumps
    * the LAST pixel's blue channel by 1 — wrapping 0xff→0x00, so the
    * luminance swing can be −255, not just +1, but it stays confined
    * to one 9×8-grid block: pixel (w−1, h−1) of a 16×16 image lands
    * in grid column gx=8, the RIGHTMOST column, which feeds exactly
    * ONE adjacent comparison, so ≤ 1 dHash bit can flip
    * (MultimodalSpec asserts Hamming ≤ 1 accordingly). */
  def synthBmp(seed: Long, w: Int = 16, h: Int = 16,
      tweakBlue: Boolean = false): Array[Byte] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def le32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; le32(2, size); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    b(26) = 1; b(28) = 24 // one plane, 24 bpp
    le32(34, rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = mix(seed * 1000003L + (y * w + x))
      val o = 54 + y * rowBytes + x * 3
      b(o) = (v & 0xff).toByte            // blue
      b(o + 1) = ((v >> 8) & 0xff).toByte // green
      b(o + 2) = ((v >> 16) & 0xff).toByte // red
    }
    if (tweakBlue) {
      val o = 54 + (h - 1) * rowBytes + (w - 1) * 3
      b(o) = (b(o) + 1).toByte
    }
    b
  }

  /** 64-bit difference hash (dHash) over the REALLY-decoded pixels:
    * the image collapses to a 9×8 luminance grid by EXACT integer
    * block sums (block (gx, gy) covers pixels [gx·W/9, (gx+1)·W/9) ×
    * [gy·H/8, (gy+1)·H/8) — integer-floor boundaries, no resampling
    * filter, so the hash is bit-identical in any environment, unlike
    * Graphics2D interpolation), luminance = 299·R + 587·G + 114·B per
    * pixel summed per block, and bit (gx, gy) = 1 iff block (gx, gy)
    * outshines its right neighbor — compared as cross-multiplied
    * integer sums (sumL·nR > sumR·nL) so uneven block sizes stay
    * exact. None for undecodable payloads. */
  def dHashKernel(bytes: Array[Byte]): Option[Long] =
    decodePixelsKernel(bytes).map { case (w, h, px) =>
      val gw = 9; val gh = 8
      val sums = Array.ofDim[Long](gh, gw)
      val cnts = Array.ofDim[Long](gh, gw)
      var y = 0
      while (y < h) {
        val gy = math.min(y * gh / h, gh - 1)
        var x = 0
        while (x < w) {
          val gx = math.min(x * gw / w, gw - 1)
          val p = px(y * w + x)
          val lum = 299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) +
            114L * (p & 0xff)
          sums(gy)(gx) += lum
          cnts(gy)(gx) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var bit = 0
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw - 1) {
          val l = sums(gy)(gx) * cnts(gy)(gx + 1)
          val r = sums(gy)(gx + 1) * cnts(gy)(gx)
          if (l > r) hash |= (1L << bit)
          bit += 1
          gx += 1
        }
        gy += 1
      }
      hash
    }

  /** A hashed image row. */
  case class ImageHash(doc_id: Long, decoded: Boolean, dhash: Long)

  /** dHash for every payload — the [[decodePixelFeatures]] batch seam;
    * only (id, 64-bit hash) ever leaves the task. */
  def imageDHashes(spark: SparkSession, withPayloads: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    withPayloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, bytes) =>
          dHashKernel(bytes) match {
            case Some(hv) => ImageHash(id, decoded = true, hv)
            case None     => ImageHash(id, decoded = false, 0L)
          }
        }
      }
  }

  /** Near-duplicate image pairs at Hamming distance ≤ `maxHamming`
    * over the dHashes — the pigeonhole-banded join (the MinHash-LSH
    * shape on bit strings): any pair within Hamming ≤ 3 agrees on at
    * least one of the four 16-bit quarters, so candidates come from
    * quarter-equality joins (uniform 2⁻¹⁶ collision rate — never
    * all-pairs) and the exact bit_count verify runs only on them.
    * @return (doc_a, doc_b, hamming) with doc_a < doc_b, distinct */
  def dhashNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 quarters guarantee recall only to Hamming 3")
    val banded = hashes.filter(col("decoded"))
      .select(col("doc_id"), col("dhash"),
        explode(array((0 until 4).map(qq =>
          struct(lit(qq).as("band"),
            shiftrightunsigned(col("dhash"), qq * 16)
              .bitwiseAND(lit(0xffffL)).as("bq"))): _*)).as("q"))
      .select(col("doc_id"), col("dhash"),
        col("q.band").as("band"), col("q.bq").as("bq"))
    val cand = banded.select(col("doc_id").as("doc_a"),
        col("dhash").as("ha"), col("band"), col("bq"))
      .join(banded.select(col("doc_id").as("doc_b"),
        col("dhash").as("hb"), col("band"), col("bq")),
        Seq("band", "bq"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        Dedup.hamming(col("ha"), col("hb")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** A parsed PCM WAV payload: header fields + decoded samples. */
  case class AudioPcm(channels: Int, sampleRate: Int, bits: Int,
      samples: Array[Int])

  /** Codec-free WAV (RIFF) parse — REAL container walking, not a stub:
    * "RIFF"+size+"WAVE", then a chunk walk (ids are 4 ASCII bytes,
    * sizes little-endian uint32, odd-sized chunks pad to word
    * boundaries per the RIFF spec) until "fmt " (PCM format tag 1,
    * channels, sample rate, bits) and "data" (LE int16 samples) are
    * both seen. Unknown chunks (LIST, cue, bext, ...) skip cleanly —
    * a lake-scale audio sweep must not die on a broadcast-WAV's
    * metadata chunk. None for anything that isn't 16-bit PCM WAV. */
  def parseWav(bytes: Array[Byte]): Option[AudioPcm] = {
    def u(i: Int): Int = bytes(i) & 0xff
    def le16(o: Int): Int = u(o) | (u(o + 1) << 8)
    def le32(o: Int): Long =
      (u(o) | (u(o + 1) << 8) | (u(o + 2) << 16) | (u(o + 3).toLong << 24)) & 0xffffffffL
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(o)
      val sz = le32(o + 4)
      if (o + 8 + sz > bytes.length) return None // truncated chunk
      if (id == "fmt " && sz >= 16) {
        if (le16(o + 8) != 1) return None // PCM only
        fmt = Some((le16(o + 10), le32(o + 12).toInt, le16(o + 22)))
      } else if (id == "data") {
        data = Some((o + 8, sz.toInt))
      }
      o += 8 + sz.toInt + (sz.toInt & 1) // word-align odd chunks
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((off, len)))
          if bits == 16 && ch >= 1 && len % 2 == 0 =>
        val n = len / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = (le16(off + 2 * i) << 16) >> 16 // sign-extend
          i += 1
        }
        Some(AudioPcm(ch, rate, bits, samples))
      case _ => None
    }
  }

  /** Exact-integer PCM features of a decoded audio payload. `peak` is
    * max |sample|; `sum_sq` the BIGINT energy; `n_clipped` counts
    * full-scale samples (±32767/−32768 — what a clipped recording
    * pins at). All integers, so the whole row hash-oracles. */
  case class AudioFeatures(
      doc_id: Long,
      decoded: Boolean,
      channels: Int,
      sample_rate: Int,
      n_samples: Long,
      peak: Long,
      sum_sq: Long,
      n_clipped: Long)

  /** Audio features for every payload through the same batched
    * mapPartitions seam as [[decodePixelFeatures]] — sample arrays
    * never leave the task; only fixed-width integer features cross
    * the shuffle, so output is O(rows) however long the clips are. */
  def audioStats(spark: SparkSession, withPayloads: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    withPayloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWav(bytes) match {
          case Some(AudioPcm(ch, rate, _, samples)) =>
            var peak = 0L; var sq = 0L; var clipped = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toLong
              val a = math.abs(v)
              if (a > peak) peak = a
              sq += v * v
              if (v == 32767L || v == -32768L) clipped += 1
              i += 1
            }
            AudioFeatures(id, decoded = true, ch, rate,
              samples.length.toLong, peak, sq, clipped)
          case None =>
            AudioFeatures(id, decoded = false, 0, 0, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** One content fingerprint per non-overlapping `window`-sample
    * slice of a decoded clip. */
  case class AudioWindowKey(doc_id: Long, decoded: Boolean,
      win_idx: Long, win_key: Long)

  /** Acoustic-fingerprint windows over REALLY-decoded PCM (the
    * Chromaprint idea — Wang 2003 / acoustid.org — reduced to exact
    * integers): the sample stream slices into non-overlapping
    * `window`-sample pieces and each piece folds to one 64-bit
    * content key, a position-weighted sum Σ (j+13)²·vⱼ over the
    * window's samples. Two clips that carry the SAME audio at a
    * window-aligned offset (a leading-silence trim, a re-encode of a
    * tail segment) share the keys of their overlapping windows, so
    * near-dup detection becomes an equality JOIN on (win_key) —
    * the inverted-index shape: at 100 TB the join shuffles
    * fixed-width (doc_id, long) rows only; samples never leave the
    * mapPartitions task. A trailing partial window is dropped (its
    * key would depend on clip length, breaking trim alignment).
    * Undecodable payloads surface as one decoded=false row. */
  def audioFingerprints(spark: SparkSession, withPayloads: DataFrame,
      window: Int = 64): Dataset[AudioWindowKey] = {
    import spark.implicits._
    withPayloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWav(bytes) match {
          case Some(AudioPcm(_, _, _, samples)) =>
            (0 until samples.length / window).iterator.map { w =>
              var key = 0L
              var j = 0
              while (j < window) {
                val q = (j + 13).toLong
                key += q * q * samples(w * window + j)
                j += 1
              }
              AudioWindowKey(id, decoded = true, w.toLong, key)
            }
          case None =>
            Iterator.single(AudioWindowKey(id, decoded = false, 0L, 0L))
        }
      })
  }

  /** The synthBmp of audio: a deterministic 16-bit PCM WAV whose
    * samples derive from the repo's md5Hash60 convention — sample i
    * of doc `seed` is clamp(md5Hash60("<seed>:<i>") % 70001 − 35000),
    * so DuckDB re-derives the exact byte-identical sample stream with
    * generate_series + md5 (full hash oracle, stronger than
    * image_neardup's pinned cells) and ~6.4% of samples land outside
    * [−32768, 32767] and clip to full scale — the clip-fraction plant.
    * `junkChunk` prepends an ODD-sized unknown chunk before "data" to
    * force the parser's skip + word-align path. `sampleOffset` shifts
    * which ABSOLUTE sample indices the clip carries (the synthAvi
    * frameOffset convention): a leading-silence-trimmed re-upload of
    * clip `seed` regenerates the SAME later samples, so content-key
    * matching finds the copy from decoded bytes alone. */
  def synthWav(seed: Long, nSamples: Int, channels: Int = 1,
      sampleRate: Int = 8000, junkChunk: Boolean = false,
      sampleOffset: Int = 0): Array[Byte] = {
    require(nSamples % channels == 0, "whole frames only")
    val junk = if (junkChunk) 8 + 3 + 1 else 0 // odd size 3 + pad
    val dataSize = nSamples * 2
    val size = 44 + junk + dataSize
    val b = new Array[Byte](size)
    def le16(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(b, o)
    tag(0, "RIFF"); le32(4, size - 8); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
    le32(24, sampleRate); le32(28, sampleRate * 2 * channels)
    le16(32, 2 * channels); le16(34, 16)
    var o = 36
    if (junkChunk) {
      tag(o, "LIST"); le32(o + 4, 3)
      b(o + 8) = 'j'; b(o + 9) = 'n'; b(o + 10) = 'k' // pad byte stays 0
      o += 12
    }
    tag(o, "data"); le32(o + 4, dataSize)
    var i = 0
    while (i < nSamples) {
      val raw = md5Long60(s"$seed:${i + sampleOffset}") % 70001L - 35000L
      val v = math.max(-32768L, math.min(32767L, raw)).toInt
      le16(o + 8 + 2 * i, v)
      i += 1
    }
    b
  }

  /** A parsed AVI payload: header dims + raw 8-bit grayscale frames. */
  case class VideoClip(width: Int, height: Int, nFrames: Int,
      frames: Array[Array[Byte]])

  /** Codec-free AVI (RIFF) parse — REAL container walking like
    * [[parseWav]]: "RIFF"+size+"AVI ", then a top-level chunk walk;
    * LIST "hdrl" is walked for the 56-byte "avih" main header
    * (dwWidth/dwHeight at offsets 32/36, dwTotalFrames at 16); LIST
    * "movi" yields the uncompressed frame chunks ("00db" = stream-0
    * uncompressed DIB per the AVI spec; here 8-bit grayscale, one
    * byte per pixel). Unknown chunks and LISTs skip cleanly with RIFF
    * word alignment. None for anything that isn't this shape — a
    * lake-scale video sweep must not die on a compressed clip. */
  def parseAvi(bytes: Array[Byte]): Option[VideoClip] = {
    def u(i: Int): Int = bytes(i) & 0xff
    def le32(o: Int): Long =
      (u(o) | (u(o + 1) << 8) | (u(o + 2) << 16) | (u(o + 3).toLong << 24)) & 0xffffffffL
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var w = 0; var h = 0; var declared = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = tag(o)
      val sz = le32(o + 4).toInt
      if (o + 8 + sz > bytes.length) return None // truncated chunk
      if (id == "LIST" && sz >= 4) {
        val form = tag(o + 8)
        if (form == "hdrl") {
          // walk the header list for avih
          var p = o + 12
          val end = o + 8 + sz
          while (p + 8 <= end) {
            val cid = tag(p)
            val csz = le32(p + 4).toInt
            if (cid == "avih" && csz >= 40) {
              declared = le32(p + 8 + 16).toInt
              w = le32(p + 8 + 32).toInt
              h = le32(p + 8 + 36).toInt
            }
            p += 8 + csz + (csz & 1)
          }
        } else if (form == "movi") {
          var p = o + 12
          val end = o + 8 + sz
          while (p + 8 <= end) {
            val cid = tag(p)
            val csz = le32(p + 4).toInt
            if (cid == "00db" && p + 8 + csz <= bytes.length)
              frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + csz)
            p += 8 + csz + (csz & 1)
          }
        }
      }
      o += 8 + sz + (sz & 1)
    }
    if (w <= 0 || h <= 0 || frames.isEmpty) None
    else if (frames.exists(_.length != w * h)) None
    else if (declared != frames.length) None // index/header disagree
    else Some(VideoClip(w, h, frames.length, frames.toArray))
  }

  /** Exact-integer features of one SAMPLED video frame: luminance sum
    * and peak over the decoded bytes, plus a position-weighted content
    * key Σ px(p)·(p+7)³ — commutative integer terms both engines can
    * fold, discriminative enough that equal keys mean equal frames
    * for matching purposes (max value ≈ 3e11, BIGINT-safe). */
  case class VideoFrameFeatures(
      doc_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      n_frames: Long,
      frame_idx: Long,
      lum_sum: Long,
      lum_peak: Long,
      frame_key: Long)

  /** Per-sampled-frame features through the same batched mapPartitions
    * seam as [[audioStats]] — frame pixels never leave the task; every
    * `stride`-th frame is sampled (the serving pattern: hash/stat a
    * sparse frame subset, not the whole clip), so output is
    * O(rows · frames/stride) fixed-width integers however large the
    * frames are. Undecodable payloads surface as one decoded=false
    * row. */
  def videoFrameStats(spark: SparkSession, withPayloads: DataFrame,
      stride: Int = 2): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    withPayloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseAvi(bytes) match {
          case Some(VideoClip(w, h, n, frames)) =>
            (0 until n by stride).iterator.map { f =>
              val px = frames(f)
              var sum = 0L; var peak = 0L; var key = 0L
              var p = 0
              while (p < px.length) {
                val v = (px(p) & 0xff).toLong
                sum += v
                if (v > peak) peak = v
                val q = (p + 7).toLong
                key += v * q * q * q
                p += 1
              }
              VideoFrameFeatures(id, decoded = true, w, h, n.toLong,
                f.toLong, sum, peak, key)
            }
          case None =>
            Iterator.single(VideoFrameFeatures(id, decoded = false,
              0, 0, 0L, 0L, 0L, 0L, 0L))
        }
      })
  }

  /** The synthWav of video: a deterministic RIFF AVI whose 16×16
    * 8-bit grayscale frames derive from md5Long60 in 7-byte groups —
    * pixel p of ABSOLUTE frame f is byte (p mod 7) of
    * md5Long60("av:<seed>:<f>:<p/7>"), so DuckDB re-derives every
    * sampled frame's exact stats with generate_series + md5 (the
    * audio_stats convention). `frameOffset` shifts which absolute
    * frames the clip carries: a trimmed re-upload of clip `seed`
    * regenerates the SAME pixel content for the shared frames —
    * content-key matching then finds the copy from decoded bytes
    * alone. `junkList` prepends an odd-sized unknown LIST to force
    * the walker's skip + word-align path. */
  def synthAvi(seed: Long, nFrames: Int, frameOffset: Int = 0,
      junkList: Boolean = false): Array[Byte] = {
    val w = 16; val h = 16
    val frameBytes = w * h
    val hdrlSz = 4 + 8 + 56 // "hdrl" + avih header + payload
    val junk = if (junkList) 8 + 4 + 3 + 1 else 0 // LIST + form + odd + pad
    val moviSz = 4 + nFrames * (8 + frameBytes)
    val size = 12 + (8 + hdrlSz) + junk + (8 + moviSz)
    val b = new Array[Byte](size)
    def le16(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(b, o)
    tag(0, "RIFF"); le32(4, size - 8); tag(8, "AVI ")
    var o = 12
    tag(o, "LIST"); le32(o + 4, hdrlSz); tag(o + 8, "hdrl")
    tag(o + 12, "avih"); le32(o + 16, 56)
    val a = o + 20
    le32(a, 33333) // dwMicroSecPerFrame (~30 fps)
    le32(a + 16, nFrames) // dwTotalFrames
    le32(a + 24, 1) // dwStreams
    le32(a + 28, frameBytes) // dwSuggestedBufferSize
    le32(a + 32, w); le32(a + 36, h)
    o += 8 + hdrlSz
    if (junkList) {
      // declared size 7 (form + 3 data bytes) is ODD — the walker must
      // add the RIFF pad byte to land on the movi LIST
      tag(o, "LIST"); le32(o + 4, 4 + 3)
      tag(o + 8, "jnk "); b(o + 12) = 1; b(o + 13) = 2; b(o + 14) = 3
      o += junk
    }
    tag(o, "LIST"); le32(o + 4, moviSz); tag(o + 8, "movi")
    o += 12
    var fl = 0
    while (fl < nFrames) {
      tag(o, "00db"); le32(o + 4, frameBytes)
      val f = fl + frameOffset
      var p = 0
      while (p < frameBytes) {
        val grp = md5Long60(s"av:$seed:$f:${p / 7}")
        b(o + 8 + p) = ((grp >> (8 * (p % 7))) & 0xffL).toByte
        p += 1
      }
      o += 8 + frameBytes
      fl += 1
    }
    b
  }

  /** First 60 bits of md5 as a nonnegative long — the plain-JVM twin
    * of Dedup.md5Hash60 (`CAST('0x' || substr(md5(s), 1, 15) AS
    * BIGINT)`): big-endian first 8 digest bytes, top 60 kept. */
  def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
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
