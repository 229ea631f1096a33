package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildWords(keys: Seq[Long], m: Int, k: Int,
      partitions: Int): Array[Long] =
    keys.toDF("h").repartition(partitions)
      .agg(Bloom.agg(m, k)(col("h")))
      .head().getSeq[Long](0).toArray

  test("no false negatives: every inserted key probes true, any m") {
    for (m <- Seq(64, 512, 1 << 16)) {
      val keys = (0L until 200L).map(i => i * 0x9E3779B97F4AL % (1L << 60))
      val words = buildWords(keys, m, 3, partitions = 8)
      val probed = keys.toDF("h")
        .select(Bloom.mightContain(typedLit(words.toSeq), col("h"), m, 3))
        .collect().map(_.getBoolean(0))
      assert(probed.forall(identity), s"false negative at m=$m")
    }
  }

  test("merge is the word-wise OR: partition layout never changes the filter") {
    val keys = (0L until 1000L).map(i => i * 7919L)
    val one = buildWords(keys, 1 << 12, 3, partitions = 1)
    val many = buildWords(keys, 1 << 12, 3, partitions = 32)
    assert(one.toSeq == many.toSeq)
  }

  test("column bit positions match the JVM positions bit-for-bit") {
    val m = 1 << 20
    val hs = Seq(0L, 1L, 63L, 64L, (1L << 60) - 1, 123456789012345L)
    val fromCols = hs.toDF("h")
      .select(array(Bloom.bitPositions(col("h"), m, 3): _*).as("ps"))
      .collect().map(_.getSeq[Long](0).map(_.toInt).toSeq)
    val fromJvm = hs.map(h => Bloom.positions(h, m, 3).toSeq)
    assert(fromCols.toSeq == fromJvm)
  }

  test("false-positive rate stays near the (1-e^(-kn/m))^k design point") {
    val m = 1 << 12 // deliberately tight: 4096 bits
    val k = 3
    val members = (0L until 500L).map(i => i * 1000003L % (1L << 60))
    val words = buildWords(members, m, k, partitions = 4)
    val nonMembers = (0L until 20000L).map(i => (i * 2654435761L + 17L) % (1L << 60))
      .filterNot(members.toSet)
    val fps = nonMembers.toDF("h")
      .select(Bloom.mightContain(typedLit(words.toSeq), col("h"), m, k))
      .collect().count(_.getBoolean(0))
    val load = k.toDouble * members.size / m
    val expected = math.pow(1 - math.exp(-load), k)
    val rate = fps.toDouble / nonMembers.size
    // loose 3x envelope: double hashing tracks the classic rate
    assert(rate <= expected * 3 + 0.01,
      s"FP rate $rate vs design $expected (m=$m k=$k n=${members.size})")
    assert(fps > 0, "tight filter must show SOME false positives")
  }

  test("contamPreProbe: bloom hits dominate exact hits, never undercount") {
    val docs = (0L until 60L)
      .map(i => (i, (0 until 12).map(j => s"w${(i * 3 + j) % 40}").mkString(" ")))
      .toDF("doc_id", "text")
    // a filter this small WILL false-positive; exact never exceeds it
    val out = Bloom.contamPreProbe(docs, col("doc_id"), col("text"),
        m = 512, k = 3)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nSh, exact, bloomHits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bloomHits >= exact, s"false negative on doc ${r.getLong(0)}")
      assert(bloomHits <= nSh)
    }
  }
}
