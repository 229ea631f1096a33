package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY §5.2.4): ∀ random readings —
  * tumbling windows partition the event set; sliding 1min/30s puts each
  * row in exactly 2 windows; agg invariants hold; sliding counts
  * decompose into half-window tumbles.
  *
  * Drives ScalaCheck generators directly (fixed seeds → reproducible;
  * the scalatestplus bridge isn't on the offline classpath).
  */
class WindowPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val MinUs = 60000000L

  private val readingsGen: Gen[List[(String, Long, Double)]] =
    Gen.listOfN(60, for {
      m <- Gen.oneOf("m1", "m2", "m3")
      t <- Gen.chooseNum(0L, 20L * MinUs)
      v <- Gen.chooseNum(-1000.0, 1000.0)
    } yield (m, t, v))

  private def samples(n: Int): Seq[List[(String, Long, Double)]] =
    (1 to n).flatMap(i =>
      readingsGen(Gen.Parameters.default, Seed(i.toLong)))

  test("tumbling windows partition the input; sliding doubles it; min<=avg<=max") {
    samples(8).foreach { rows =>
      val df = rows.toDF("machine_id", "tus", "value")
      val tumb = Windows.tumblingAggUs(df, col("tus"), MinUs,
        Seq(col("machine_id")), col("value"))
      val slid = Windows.slidingAggUs(df, col("tus"), MinUs, MinUs / 2,
        Seq(col("machine_id")), col("value"))
      assert(tumb.agg(sum("count_readings")).as[Long].head() == rows.size)
      assert(slid.agg(sum("count_readings")).as[Long].head() == 2L * rows.size)
      val bad = tumb.filter(
        col("min_value") > col("max_value") ||
          col("min_value") - 0.0001 > col("avg_value") ||
          col("avg_value") > col("max_value") + 0.0001)
      assert(bad.count() == 0)
    }
  }

  test("every sliding window's count is the sum of its two half-window tumbles") {
    samples(5).foreach { rows =>
      val df = rows.toDF("machine_id", "tus", "value")
      val halves = Windows.tumblingAggUs(df, col("tus"), MinUs / 2,
        Seq(col("machine_id")), col("value"))
        .select(col("machine_id"), col("window_start_us"), col("count_readings"))
        .as[(String, Long, Long)].collect()
        .map { case (m, w, c) => (m, w) -> c }.toMap
      val slid = Windows.slidingAggUs(df, col("tus"), MinUs, MinUs / 2,
        Seq(col("machine_id")), col("value"))
        .select(col("machine_id"), col("window_start_us"), col("count_readings"))
        .as[(String, Long, Long)].collect()
      slid.foreach { case (m, w, c) =>
        val expect = halves.getOrElse((m, w), 0L) + halves.getOrElse((m, w + MinUs / 2), 0L)
        assert(c == expect, s"window ($m,$w): $c != $expect")
      }
    }
  }

  test("generator determinism: same seed, same data (A3)") {
    val a = samples(3); val b = samples(3)
    assert(a == b)
  }
}
