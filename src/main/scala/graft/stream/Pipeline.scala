package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Ingest, Windows}

/** The streaming pipeline — the reference's Task 3
  * (flink-jobs/sensor_aggregation.py), Spark-native.
  *
  * Semantics reproduced (SURVEY §2 J1-J7):
  *  - event time from the message's ISO string (J1, C1);
  *  - 5-second watermark; rows later than the watermark are dropped once
  *    their window's state is evicted (J2/J3) — `outputMode(append)`
  *    emits each finalized window exactly once;
  *  - dual-sink fan-out (J4): Flink's statement set optimizes two
  *    INSERTs into one source scan. Spark has no statement set; the
  *    idiomatic mapping is two streaming queries over the same prepared
  *    frame — the raw branch is stateless, the agg branch holds window
  *    state, and they cannot share one writeStream. The source is read
  *    once per query with independent offsets; same row sets, the
  *    trade-off SURVEY §2 J4 documents.
  *  - checkpointing → exactly-once into files, at-least-once into
  *    JDBC-shaped sinks (J6), matching the reference's guarantees.
  *
  * Scale notes: the windowed agg is a partial+final HashAggregate over
  * the state store — shuffle volume is O(open windows × keys), not
  * O(rows); state is bounded by the watermark. The raw branch is pure
  * map-side projection.
  */
object Pipeline {

  /** Decoded stream → event-timed, watermarked frame (J1/J2). */
  def prepare(decoded: DataFrame, watermark: String = "5 seconds"): DataFrame =
    Ingest.withEventTime(decoded, col("timestamp"))
      .withColumn("event_time", col("event_time").cast("timestamp"))
      .withWatermark("event_time", watermark)

  /** Streaming tumbling/sliding aggregate (F1/F2 under a watermark) —
    * the same Windows expression the batch path uses (F3 equivalence). */
  def windowedAggregates(prepared: DataFrame, size: String = "1 minute",
      slide: Option[String] = None): DataFrame =
    Windows.windowedAgg(prepared, col("event_time"), size, slide,
      Seq(col("machine_id"), col("sensor_type")), col("value"))

  /** Raw pass-through projection (C2): event-timed readings shaped like
    * the machine_sensors sink (sensor_aggregation.py:76-80). */
  def rawRows(prepared: DataFrame): DataFrame =
    prepared.select(
      col("machine_id"), col("sensor_type"), col("value"),
      col("event_time").as("timestamp"))

  /** Start the dual-sink pipeline: branch A raw pass-through, branch B
    * finalized 1-minute windows; both checkpointed, both driven to
    * completion of available input with `AvailableNow` (tests/backfill)
    * or left running with the default trigger.
    *
    * @return (rawQuery, aggQuery)
    */
  def run(
      spark: SparkSession,
      decoded: DataFrame,
      writeRaw: DataFrame => Unit,
      writeAgg: DataFrame => Unit,
      checkpointDir: String,
      availableNow: Boolean = true): (StreamingQuery, StreamingQuery) = {
    val prepared = prepare(decoded)

    def trigger[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T]) =
      if (availableNow) w.trigger(Trigger.AvailableNow()) else w

    val raw = trigger(rawRows(prepared).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/raw")
      .foreachBatch { (batch: DataFrame, _: Long) => writeRaw(batch) })
      .start()

    val agg = trigger(windowedAggregates(prepared).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/agg")
      .foreachBatch { (batch: DataFrame, _: Long) => writeAgg(batch) })
      .start()

    (raw, agg)
  }
}
