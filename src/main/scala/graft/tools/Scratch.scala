package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    import s.implicits._
    // Skew: salted vs direct aggregation on a deliberately hot key
    val hot = graft.Tables.events(s, "/root/testdata/sf0.1")
      .withColumn("k", when(col("user_id") < 140, lit("HOT")).otherwise(col("user_id").cast("string")))
    val direct = hot.groupBy("k").agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(1).collect()(0)
    val salted = graft.ops.Skew.saltedStandardAggs(hot, Seq(col("k")), col("value"))
      .orderBy(desc("count_readings")).limit(1).collect()(0)
    println(s"PROBE skew direct=${direct.getString(0)}:${direct.getLong(1)} salted=${salted.getString(0)}:${salted.getLong(4)}")
    // Retention: build a partitioned lake, drop expired partitions
    val work = java.nio.file.Files.createTempDirectory("ret").toString
    val rows = Seq(("2025-01-01T00:00:00", 1.0), ("2025-03-01T00:00:00", 2.0))
      .toDF("iso", "v")
      .withColumn("timestamp", to_timestamp_ntz(regexp_replace(col("iso"), "T", " ")))
    graft.io.LakeSink(s"$work/lake").write(graft.ops.Ingest.withDateParts(rows, col("timestamp")))
    val dropped = graft.ops.Retention.dropExpiredPartitions(s"$work/lake", java.time.LocalDate.of(2025, 2, 1))
    println(s"PROBE retention dropped=$dropped remaining=${s.read.parquet(s"$work/lake").count()}")
    s.stop()
  }
}
