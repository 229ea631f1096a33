package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries guarantees, partition-layout independence of the
  * guarantees (NOT of the exact estimates — those legitimately vary,
  * which is why heavy_hitters is rows-only), and majority recovery. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 500×a + 200×b + 120×c + 180 unique fillers = 1000 items.
  private def corpus: Seq[String] =
    Seq.fill(500)("a") ++ Seq.fill(200)("b") ++ Seq.fill(120)("c") ++
      (0 until 180).map(i => s"filler_$i")

  private def trueCounts = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketch(k: Int, parts: Int): Map[String, Long] = {
    val ds = spark.createDataset(corpus).repartition(parts)
    ds.select(HeavyHitters.misraGries(k))
      .collect().head.toMap
  }

  for (parts <- Seq(1, 8)) {
    test(s"MG guarantees hold at $parts partition(s)") {
      val k = 10
      val n = corpus.size
      val est = sketch(k, parts)
      // every item with true frequency > n/k is present
      for ((item, c) <- trueCounts if c > n / k)
        assert(est.contains(item), s"$item (true $c) missing from $est")
      // estimates are lower bounds within n/k of truth
      for ((item, e) <- est) {
        val t = trueCounts(item)
        assert(e <= t, s"$item est $e > true $t")
        assert(t - e <= n / k, s"$item est $e too far below true $t")
      }
    }
  }

  test("majority item ranks first deterministically") {
    val ds = spark.createDataset(corpus).repartition(4)
    val first = ds.select(HeavyHitters.misraGries(5)).collect().head.head._1
    assert(first === "a")
  }

  test("sketch state never exceeds k-1 counters") {
    val est = sketch(k = 4, parts = 8)
    assert(est.size <= 3)
    assert(est.contains("a")) // 500 > 1000/4
  }
}
