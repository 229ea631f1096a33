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
}
