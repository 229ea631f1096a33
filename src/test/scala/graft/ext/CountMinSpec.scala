package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def build(keys: Seq[Long], w: Int, d: Int,
      partitions: Int): Array[Long] =
    keys.toDF("h").repartition(partitions)
      .agg(CountMin.agg(w, d)(col("h")))
      .head().getSeq[Long](0).toArray

  private def estimates(cells: Array[Long], keys: Seq[Long], w: Int,
      d: Int): Map[Long, Long] =
    keys.distinct.toDF("h")
      .select(col("h"), CountMin.estimate(typedLit(cells.toSeq), col("h"), w, d))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("never undercounts: estimate >= true count for every key") {
    val w = 64 // deliberately tight: collisions guaranteed
    val keys = (0L until 3000L).map(i => (i % 300L) * 48271L % (1L << 60))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = build(keys, w, 4, partitions = 8)
    val est = estimates(cells, keys, w, 4)
    truth.foreach { case (h, c) =>
      assert(est(h) >= c, s"undercount at $h: est ${est(h)} < true $c")
    }
  }

  test("overcount stays inside a loose CMS envelope on skew + noise") {
    val w = 256
    val d = 4
    val heavy = Seq.fill(2000)(424242L)
    val noise = (0L until 6000L).map(i => (i * 2654435761L + 3L) % (1L << 60))
    val keys = heavy ++ noise
    val n = keys.size.toLong
    val cells = build(keys, w, d, partitions = 16)
    val est = estimates(cells, keys, w, d)
    // heavy hitter: min-of-d keeps the estimate near truth even tight
    assert(est(424242L) >= 2000L && est(424242L) <= 2000L + 5 * n / w,
      s"heavy est ${est(424242L)}")
    // average overcount across noise keys ~ N/w per row; 5x envelope
    val noiseKeys = noise.distinct.filterNot(_ == 424242L)
    val meanOver = noiseKeys.map(h => est(h) - keys.count(_ == h)).sum
      .toDouble / noiseKeys.size
    assert(meanOver <= 5.0 * n / w, s"mean overcount $meanOver vs N/w=${n / w}")
  }

  test("cells are partition-invariant pure sums (the oracle contract)") {
    val keys = (0L until 5000L).map(i => i * 7919L % (1L << 60))
    val one = build(keys, 512, 4, partitions = 1)
    val many = build(keys, 512, 4, partitions = 32)
    assert(one.toSeq == many.toSeq)
    assert(one.sum == keys.size.toLong * 4, "each input increments d cells")
  }
}
