package graft.gen

import java.time.Instant

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataGenSpec extends SparkSpec {
  import spark.implicits._

  private val end = Instant.parse("2025-01-08T00:00:00Z")

  test("backfill volume: 7d x 24h x 16 dims = 2,688 messages (A4)") {
    assert(DataGen.backfill(spark, end).count() == 2688)
  }

  test("backfill is deterministic under a fixed seed") {
    val a = DataGen.backfill(spark, end, seed = 7L)
      .orderBy("tus", "machine_id", "sensor_type").collect().toSeq
    val b = DataGen.backfill(spark, end, seed = 7L)
      .orderBy("tus", "machine_id", "sensor_type").collect().toSeq
    assert(a == b)
  }

  test("values are Gaussian around each template's mean, rounded to 2dp (A3/C5)") {
    val stats = DataGen.backfill(spark, end)
      .groupBy("sensor_type").agg(avg("value").as("m"))
      .as[(String, Double)].collect().toMap
    val expect = DataGen.SensorTemplates.map(t => t.sensor_type -> t.mean).toMap
    expect.foreach { case (st, mu) =>
      assert(math.abs(stats(st) - mu) < mu.max(1.0) * 0.2, s"$st mean ${stats(st)} vs $mu")
    }
    val offGrid = DataGen.backfill(spark, end)
      .filter(round(col("value"), 2) =!= col("value"))
    assert(offGrid.count() == 0)
  }

  test("live rate-source mode emits dim-fanned readings (A5)") {
    val name = s"live${System.nanoTime()}"
    val q = DataGen.live(spark, intervalSeconds = 1)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      // rate source: ~1 tick/s, each fanned to 16 (machine, sensor) rows
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table(name).count() < 16 && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
    } finally q.stop()
    val got = spark.table(name)
    assert(got.count() >= 16)
    assert(got.select("machine_id").distinct().count() == 4)
    assert(got.select("sensor_type").distinct().count() == 4)
  }

  test("timestamp strings are ISO-8601 'T'-separated (C6)") {
    val t = DataGen.backfill(spark, end).select("timestamp").as[String].head()
    assert(t.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}"""))
  }
}
