package graft.flow

import java.nio.file.Files

import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{LakeSink, ParquetSource}

class NightlyEtlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-etl").toString

  test("extract → transform → load with partition layout and verification (L1/K1)") {
    val dir = tmp()
    val src = Seq(
      ("2025-01-01T10:00:00", 1.0), ("2025-01-02T11:00:00", 2.0),
      ("2025-01-02T12:00:00", 3.0))
      .toDF("iso", "value")
      .withColumn("timestamp", to_timestamp_ntz(regexp_replace(col("iso"), "T", " ")))
      .drop("iso")
    src.write.parquet(s"$dir/src")

    val sink = LakeSink(s"$dir/lake")
    val res = NightlyEtl.runTable(spark, ParquetSource(s"$dir/src"), sink, "timestamp")
    assert(res.rows == 3)
    // physical layout: year=/month=/day= directories (K1)
    val d1 = new java.io.File(s"$dir/lake/year=2025/month=1/day=2")
    assert(d1.exists())
  }

  test("overwrite re-run is idempotent (K4)") {
    val dir = tmp()
    Seq(("2025-03-05T00:00:00", 1.0), ("2025-03-05T01:00:00", 2.0))
      .toDF("iso", "value")
      .withColumn("timestamp", to_timestamp_ntz(regexp_replace(col("iso"), "T", " ")))
      .drop("iso").write.parquet(s"$dir/src")
    val sink = LakeSink(s"$dir/lake")
    val first = NightlyEtl.runTable(spark, ParquetSource(s"$dir/src"), sink, "timestamp")
    val second = NightlyEtl.runTable(spark, ParquetSource(s"$dir/src"), sink, "timestamp")
    assert(first.rows == second.rows)
    assert(sink.read(spark).count() == 2)
  }

  test("retry recovers from transient failures (L2)") {
    var attempts = 0
    val out = NightlyEtl.retry(3, 10.millis) {
      attempts += 1
      if (attempts < 3) sys.error("transient")
      "ok"
    }
    assert(out == "ok" && attempts == 3)
    assertThrows[RuntimeException] {
      NightlyEtl.retry(2, 10.millis)(sys.error("always"))
    }
  }

  test("verification fails loudly when sink diverges from extract") {
    val dir = tmp()
    Seq(("2025-01-01T00:00:00", 1.0)).toDF("iso", "value")
      .withColumn("timestamp", to_timestamp_ntz(regexp_replace(col("iso"), "T", " ")))
      .drop("iso").write.parquet(s"$dir/src")
    // sabotage: sink path already holds an unrelated partition that
    // dynamic overwrite won't clear
    val sink = LakeSink(s"$dir/lake")
    Seq(("x", 9.9, 1999, 1, 1)).toDF("machine", "value", "year", "month", "day")
      .write.partitionBy("year", "month", "day").parquet(s"$dir/lake")
    assertThrows[IllegalArgumentException] {
      NightlyEtl.runTable(spark, ParquetSource(s"$dir/src"), sink, "timestamp",
        retries = 1, delay = 10.millis)
    }
  }
}
