package graft.tools

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.gen.DataGen
import graft.io.JsonDirSource
import graft.ops.Ingest
import graft.stream.Pipeline

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: micro-batch breakdown of the full-outer interval join. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-scratch")
    val work = Files.createTempDirectory("graft-scratch").toString
    val end = Instant.parse("2025-01-08T00:00:00Z")
    val topic = s"$work/topic"
    Ingest.encode(
      DataGen.backfill(spark, end, stepSeconds = 96L)
        .withColumn("event_time", timestamp_micros(col("tus"))))
      .select("value").write.text(topic)

    val l = Pipeline.prepare(JsonDirSource(topic).readStream(spark))
      .select(col("machine_id"), col("sensor_type"), col("value"),
        col("event_time"))
    val r = Pipeline.prepare(JsonDirSource(topic).readStream(spark))
      .filter(col("sensor_type") === "pressure")
      .select(col("machine_id"), col("value").as("alert_value"),
        col("event_time").as("alert_time"))
    val t0 = System.nanoTime()
    val q = Pipeline.correlateFull(l, r, "machine_id",
      "event_time", "alert_time", "2 MINUTES")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = b.count()
        System.err.println(f"[scratch] batch $id: $n rows at ${(System.nanoTime()-t0)/1e9}%.1fs")
      }
      .start()
    q.awaitTermination()
    System.err.println(f"[scratch] total ${(System.nanoTime()-t0)/1e9}%.1fs")
    for (p <- q.recentProgress.takeRight(8))
      System.err.println(s"[scratch] progress: batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")}")
    spark.stop()
  }
}
