package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("payload column carries bytes + typed metadata struct") {
    val df = Multimodal.withPayload(graft.Tables.documents(spark, sf))
    assert(df.schema("payload").dataType.typeName == "binary")
    val r = df.select(col("media_meta.n_bytes"), octet_length(col("payload"))).head()
    assert(r.getLong(0) == r.getInt(1).toLong)
  }

  test("batched decode stub is deterministic and total") {
    val df = Multimodal.withPayload(graft.Tables.documents(spark, sf))
    val feats = Multimodal.decodeFeatures(spark, df)
    assert(feats.count() == df.count())
    val a = feats.filter(_.doc_id == 0L).head()
    val b = Multimodal.decodeFeatures(spark, df).filter(_.doc_id == 0L).head()
    assert(a == b)
    assert(a.width >= 1 && a.height >= 1 && a.n_bytes > 0)
  }

  test("frame sampling covers the payload with fixed-size windows") {
    val df = Multimodal.withPayload(graft.Tables.documents(spark, sf).limit(5))
    val frames = Multimodal.sampleFrames(df, frameBytes = 16, stride = 2)
    assert(frames.count() >= 5)
    val widths = frames.select(octet_length(col("frame_bytes"))).collect().map(_.getInt(0))
    assert(widths.forall(_ <= 16))
    assert(frames.groupBy("doc_id").count().count() == 5)
  }

  test("image header parser reads real PNG/GIF/BMP dimensions") {
    // minimal REAL container headers, built byte-for-byte per spec.
    def png(w: Int, h: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.write(Array(0, 0, 0, 13).map(_.toByte)) // IHDR length
      b.write("IHDR".getBytes)
      for (v <- Seq(w, h); s <- Seq(24, 16, 8, 0)) b.write((v >> s) & 0xff)
      Array.fill(5)(0.toByte).foreach(b.write(_)) // bit depth..interlace
      b.toByteArray
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte) ++ Array.fill(4)(0.toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = Array.fill(30)(0.toByte)
      b(0) = 'B'; b(1) = 'M'
      for (i <- 0 until 4) { b(18 + i) = ((w >> (8 * i)) & 0xff).toByte }
      for (i <- 0 until 4) { b(22 + i) = ((h >> (8 * i)) & 0xff).toByte }
      b
    }
    assert(Multimodal.parseImageHeader(png(1920, 1080)) === Some(("png", 1920, 1080)))
    assert(Multimodal.parseImageHeader(gif(320, 200)) === Some(("gif", 320, 200)))
    assert(Multimodal.parseImageHeader(bmp(640, 480)) === Some(("bmp", 640, 480)))
    assert(Multimodal.parseImageHeader("not an image at all".getBytes) === None)
    assert(Multimodal.parseImageHeader(Array[Byte](0x89.toByte, 'P')) === None) // truncated
  }

  test("imageHeaders sweep is total over mixed recognized/unrecognized payloads") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.write(Array(0, 0, 0, 13).map(_.toByte)); b.write("IHDR".getBytes)
      for (v <- Seq(w, h); s <- Seq(24, 16, 8, 0)) b.write((v >> s) & 0xff)
      Array.fill(5)(0.toByte).foreach(b.write(_))
      b.toByteArray
    }
    val payloads = Seq(
      (1L, png(64, 32)), (2L, "just text".getBytes), (3L, png(7, 9)))
      .toDF("doc_id", "payload")
    val out = Multimodal.imageHeaders(spark, payloads)
      .collect().map(h => h.doc_id -> h).toMap
    assert(out(1L) === Multimodal.ImageHeader(1L, Some("png"), Some(64), Some(32)))
    assert(out(2L) === Multimodal.ImageHeader(2L, None, None, None))
    assert(out(3L) === Multimodal.ImageHeader(3L, Some("png"), Some(7), Some(9)))
  }

  // A REAL 2×2 PNG via the JDK encoder, with four exactly-known
  // opaque ARGB pixels (PNG is lossless, so decode must round-trip
  // them byte-exactly).
  private val KnownPixels = Array(0xff112233, 0xff445566, 0xff778899, 0xffaabbcc)
  private def realPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 2, 2, KnownPixels, 0, 2)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodePixelsKernel decodes a real PNG's pixels byte-exactly") {
    val bytes = realPng()
    // sanity: the header parser agrees this is a real 2×2 PNG
    assert(Multimodal.parseImageHeader(bytes) === Some(("png", 2, 2)))
    val Some((w, h, px)) = Multimodal.decodePixelsKernel(bytes)
    assert((w, h) === ((2, 2)))
    assert(px === KnownPixels) // lossless round-trip, every ARGB byte
    assert(Multimodal.decodePixelsKernel("not an image".getBytes) === None)
  }

  test("decodePixelFeatures: real decode features end-to-end, total over junk") {
    import spark.implicits._
    val payloads = Seq((1L, realPng()), (2L, "just text".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodePixelFeatures(spark, payloads)
      .collect().map(f => f.doc_id -> f).toMap
    val real = out(1L)
    assert(real.decoded && real.width === 2 && real.height === 2 && real.n_pixels === 4L)
    // channel means over the four known pixels: r (0x11+0x44+0x77+0xaa)/4 ...
    assert(real.mean_r === (0x11 + 0x44 + 0x77 + 0xaa) / 4.0)
    assert(real.mean_g === (0x22 + 0x55 + 0x88 + 0xbb) / 4.0)
    assert(real.mean_b === (0x33 + 0x66 + 0x99 + 0xcc) / 4.0)
    // checksum matches an independent FNV-1a fold over the same ints
    var crc = 1469598103934665603L
    KnownPixels.foreach { p =>
      (0 until 4).foreach { k => crc = (crc ^ ((p >>> (8 * k)) & 0xffL)) * 1099511628211L }
    }
    assert(real.argb_crc === crc)
    assert(!out(2L).decoded && out(2L).n_pixels === 0L)
  }

  test("dHash: deterministic on real decode; one-pixel tweak stays within Hamming 1") {
    val a = Multimodal.dHashKernel(Multimodal.synthBmp(7L))
    val a2 = Multimodal.dHashKernel(Multimodal.synthBmp(7L))
    val aT = Multimodal.dHashKernel(Multimodal.synthBmp(7L, tweakBlue = true))
    val b = Multimodal.dHashKernel(Multimodal.synthBmp(8L))
    assert(a.isDefined && a == a2, "decode + hash deterministic")
    // the tweak touches ONE block's luminance sum, feeding one
    // comparison of the 9-column grid — at most 1 bit flips
    assert(java.lang.Long.bitCount(a.get ^ aT.get) <= 1)
    // unrelated random images are far apart
    assert(java.lang.Long.bitCount(a.get ^ b.get) > 3)
    assert(Multimodal.dHashKernel("not an image".getBytes).isEmpty)
  }

  test("dhashNearDups: finds exactly the planted pair; pigeonhole recall to Hamming 3") {
    import spark.implicits._
    val pay = Seq(
      (1L, Multimodal.synthBmp(1L)),
      (2L, Multimodal.synthBmp(1L, tweakBlue = true)), // near-dup of 1
      (3L, Multimodal.synthBmp(2L)),
      (4L, Multimodal.synthBmp(3L)),
      (5L, "junk bytes".getBytes)) // undecodable — must not pair
      .toDF("doc_id", "payload")
    val pairs = Multimodal.dhashNearDups(
        Multimodal.imageDHashes(spark, pay).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 <= 1L)

    // pigeonhole recall: a synthetic hash pair at EXACTLY Hamming 3
    // (all three flips inside one quarter, so three other quarters
    // still agree) must surface through the banded join
    val h = 0x123456789abcdef0L
    val hashes = Seq((10L, true, h), (11L, true, h ^ 7L))
      .toDF("doc_id", "decoded", "dhash")
    val p2 = Multimodal.dhashNearDups(hashes, maxHamming = 3).collect()
    assert(p2.length == 1 && p2.head.getLong(2) == 3L)
  }

  test("parseWav decodes a hand-built WAV byte-exactly; rejects non-PCM and truncation") {
    // 44-byte header + 4 LE int16 samples: 0, 1000, -32768, 32767 —
    // every byte written by hand, no generator in the loop
    def wav(samples: Seq[Int], fmtTag: Int = 1): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * samples.length)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(fmtTag.toShort).putShort(1) // PCM?, mono
        .putInt(44100).putInt(44100 * 2).putShort(2).putShort(16)
      b.put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(v => b.putShort(v.toShort))
      b.array()
    }
    val parsed = Multimodal.parseWav(wav(Seq(0, 1000, -32768, 32767)))
    assert(parsed.nonEmpty)
    val p = parsed.get
    assert(p.channels == 1 && p.sampleRate == 44100 && p.bits == 16)
    assert(p.samples.toSeq == Seq(0, 1000, -32768, 32767)) // sign-extension exact
    // non-PCM format tag (3 = IEEE float) rejected
    assert(Multimodal.parseWav(wav(Seq(0, 1), fmtTag = 3)).isEmpty)
    // truncated data chunk rejected, not mis-read
    assert(Multimodal.parseWav(wav(Seq(0, 1000, -32768, 32767)).dropRight(2)).isEmpty)
    assert(Multimodal.parseWav("not audio at all, just text".getBytes).isEmpty)
  }

  test("synthWav round-trips through parseWav; junk chunk + odd padding skipped") {
    for (junk <- Seq(false, true)) {
      val bytes = Multimodal.synthWav(42L, nSamples = 10, channels = 2,
        sampleRate = 16000, junkChunk = junk)
      val p = Multimodal.parseWav(bytes).get
      assert(p.channels == 2 && p.sampleRate == 16000)
      // samples must equal the md5Hash60-derived clamped stream —
      // the exact formula the DuckDB oracle regenerates
      val expected = (0 until 10).map { i =>
        val raw = Multimodal.md5Long60(s"42:$i") % 70001L - 35000L
        math.max(-32768L, math.min(32767L, raw)).toInt
      }
      assert(p.samples.toSeq == expected, s"junk=$junk")
    }
    // md5Long60 really is Dedup.md5Hash60 (the oracle's hash family)
    import spark.implicits._
    val sqlSide = Seq("42:0", "42:7", "x").toDF("s")
      .select(Dedup.md5Hash60(col("s"))).as[Long].collect().toSeq
    assert(sqlSide == Seq("42:0", "42:7", "x").map(Multimodal.md5Long60))
  }

  test("audioStats: exact-integer features, total over undecodable payloads") {
    import spark.implicits._
    // hand-computable fixture: doc 1 = synthWav(1, 6); doc 2 = junk
    val pay = Seq(
      (1L, Multimodal.synthWav(1L, nSamples = 6)),
      (2L, "definitely not a wav".getBytes)).toDF("doc_id", "payload")
    val rows = Multimodal.audioStats(spark, pay).collect()
      .map(f => f.doc_id -> f).toMap
    val samples = (0 until 6).map { i =>
      val raw = Multimodal.md5Long60(s"1:$i") % 70001L - 35000L
      math.max(-32768L, math.min(32767L, raw))
    }
    val f1 = rows(1L)
    assert(f1.decoded && f1.n_samples == 6L)
    assert(f1.peak == samples.map(math.abs).max)
    assert(f1.sum_sq == samples.map(v => v * v).sum)
    assert(f1.n_clipped == samples.count(v => v == 32767L || v == -32768L))
    val f2 = rows(2L)
    assert(!f2.decoded && f2.n_samples == 0L && f2.sum_sq == 0L)
  }

  test("audioFingerprints: window keys line up across a window-aligned trim") {
    import spark.implicits._
    val W = 64
    // original = 4 windows; copy = the same audio with the first two
    // windows trimmed (sampleOffset = 2·W) — its windows 0..1 must
    // carry the ORIGINAL's window-2..3 keys, byte-derived on both sides
    val pay = Seq(
      (1L, Multimodal.synthWav(9L, nSamples = 4 * W)),
      (2L, Multimodal.synthWav(9L, nSamples = 2 * W, sampleOffset = 2 * W)),
      (3L, "not audio".getBytes)).toDF("doc_id", "payload")
    val rows = Multimodal.audioFingerprints(spark, pay, window = W)
      .collect().groupBy(_.doc_id)
    val orig = rows(1L).sortBy(_.win_idx)
    val copy = rows(2L).sortBy(_.win_idx)
    assert(orig.length == 4 && copy.length == 2)
    assert(copy.map(_.win_key).toSeq == orig.drop(2).map(_.win_key).toSeq)
    // and the trimmed-away windows do NOT match
    assert(!copy.map(_.win_key).toSet.exists(
      orig.take(2).map(_.win_key).toSet))
    // hand-fold window 0's key from the generator formula itself
    val expected = (0 until W).map { j =>
      val raw = Multimodal.md5Long60(s"9:$j") % 70001L - 35000L
      val v = math.max(-32768L, math.min(32767L, raw))
      (j + 13).toLong * (j + 13) * v
    }.sum
    assert(orig.head.win_key == expected)
    // undecodable payload surfaces as one decoded=false row
    assert(rows(3L).toSeq.map(r => (r.decoded, r.win_idx)) == Seq((false, 0L)))
    // a trailing PARTIAL window is dropped, not key-folded
    val part = Seq((4L, Multimodal.synthWav(9L, nSamples = W + 10)))
      .toDF("doc_id", "payload")
    assert(Multimodal.audioFingerprints(spark, part, window = W)
      .collect().length == 1)
  }

  test("multimodal_pipeline: every gate engages and the chain reconciles") {
    val r = graft.SparkEntry.queries("multimodal_pipeline")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val nm = r.getLong(0); val ni = r.getLong(1); val na = r.getLong(2)
    val nv = r.getLong(3); val nd = r.getLong(4); val ns = r.getLong(5)
    // each sequential gate must remove SOMEONE (the plants engage) …
    assert(nm > ni && ni > na && na > nv,
      s"gates must all engage: $nm > $ni > $na > $nv")
    // … the dedup stage must catch planted copies …
    assert(nd > 0, "near-dup removal must engage")
    // … and the chain reconciles exactly: dedup removes FROM s3 only
    assert(ns == nv - nd, s"survivors $ns != s3 $nv - removed $nd")
    assert(r.getLong(6) > 0L)
  }

  test("parseAvi walks a hand-built container; rejects truncation and header/frame mismatch") {
    val bytes = Multimodal.synthAvi(7L, nFrames = 4, junkList = true)
    // container anchors, checked at raw byte offsets: RIFF form,
    // hdrl LIST, the avih dims
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    assert(tag(0) == "RIFF" && tag(8) == "AVI " && tag(12) == "LIST")
    assert(tag(20) == "hdrl" && tag(24) == "avih")
    val v = Multimodal.parseAvi(bytes).get
    assert(v.width == 16 && v.height == 16 && v.nFrames == 4)
    // frame pixels equal the md5Long60 7-byte-group stream — the exact
    // formula the DuckDB oracle regenerates
    val f2 = (0 until 256).map { pIdx =>
      ((Multimodal.md5Long60(s"av:7:2:${pIdx / 7}") >> (8 * (pIdx % 7))) & 0xffL).toByte
    }
    assert(v.frames(2).toSeq == f2)
    // truncation rejected, not mis-read
    assert(Multimodal.parseAvi(bytes.dropRight(3)).isEmpty)
    // declared dwTotalFrames must match the movi frame count
    val lying = bytes.clone()
    lying(48) = 9 // dwTotalFrames LSB (avih payload 32 + offset 16)
    assert(Multimodal.parseAvi(lying).isEmpty)
    assert(Multimodal.parseAvi("not a video".getBytes).isEmpty)
  }

  test("videoFrameStats: sampled-frame stats + trim-copy content keys line up") {
    import spark.implicits._
    val n = 7
    val pay = Seq(
      (1L, Multimodal.synthAvi(1L, n)),
      (2L, Multimodal.synthAvi(1L, n - 2, frameOffset = 2)), // trimmed copy
      (3L, "not a video at all".getBytes)).toDF("doc_id", "payload")
    val rows = Multimodal.videoFrameStats(spark, pay, stride = 2).collect()
    val orig = rows.filter(r => r.doc_id == 1L && r.decoded)
    val copy = rows.filter(r => r.doc_id == 2L && r.decoded)
    // orig samples local frames 0,2,4,6; copy 0,2,4 = absolute 2,4,6
    assert(orig.map(_.frame_idx).sorted.toSeq == Seq(0L, 2L, 4L, 6L))
    assert(copy.map(_.frame_idx).sorted.toSeq == Seq(0L, 2L, 4L))
    // the copy's every sampled frame key appears among the original's
    // (content equality from decoded bytes — the video_neardup join)
    val okeys = orig.map(_.frame_key).toSet
    assert(copy.forall(c => okeys.contains(c.frame_key)))
    // keys of DIFFERENT absolute frames never collide here
    assert(okeys.size == 4)
    // exact stats vs a driver-side fold of the generator formula
    val px0 = (0 until 256).map { pIdx =>
      (Multimodal.md5Long60(s"av:1:0:${pIdx / 7}") >> (8 * (pIdx % 7))) & 0xffL
    }
    val r0 = orig.find(_.frame_idx == 0L).get
    assert(r0.lum_sum == px0.sum)
    assert(r0.lum_peak == px0.max)
    assert(r0.frame_key == px0.zipWithIndex.map { case (vv, pIdx) =>
      vv * (pIdx + 7).toLong * (pIdx + 7) * (pIdx + 7) }.sum)
    // undecodable payload: one total decoded=false row
    val junk = rows.filter(_.doc_id == 3L)
    assert(junk.length == 1 && !junk.head.decoded && junk.head.n_frames == 0L)
  }
}
