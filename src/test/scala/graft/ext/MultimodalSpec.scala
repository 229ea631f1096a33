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
}
