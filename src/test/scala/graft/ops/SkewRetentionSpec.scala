package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewRetentionSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals the direct aggregation (skew path)") {
    val df = graft.Tables.events(spark, sf)
    val direct = df.groupBy(col("event_type"))
      .agg(round(avg(col("value")), 4).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("count_readings"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val salted = Skew.saltedStandardAggs(df, Seq(col("event_type")), col("value"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (a, mn, mx, c)) =>
      val (da, dmn, dmx, dc) = direct(k)
      assert(c == dc && mn == dmn && mx == dmx, s"key $k")
      assert(math.abs(a - da) <= 0.0001, s"avg for $k: $a vs $da")
    }
  }

  test("partition-drop retention removes only expired day directories (K3)") {
    val dir = Files.createTempDirectory("graft-ret").toString
    val rows = Seq(
      ("2025-01-01T00:00:00", 1.0), ("2025-01-02T00:00:00", 2.0),
      ("2025-02-01T00:00:00", 3.0))
      .toDF("iso", "value")
      .withColumn("timestamp", to_timestamp_ntz(regexp_replace(col("iso"), "T", " ")))
      .drop("iso")
    val sink = graft.io.LakeSink(s"$dir/lake")
    sink.write(Ingest.withDateParts(rows, col("timestamp")))
    assert(sink.read(spark).count() == 3)

    val dropped = Retention.dropExpiredPartitions(
      s"$dir/lake", java.time.LocalDate.of(2025, 1, 15))
    assert(dropped == 2) // both January days expired
    assert(sink.read(spark).count() == 1)
    assert(new java.io.File(s"$dir/lake/year=2025/month=2/day=1").exists())
  }
}
