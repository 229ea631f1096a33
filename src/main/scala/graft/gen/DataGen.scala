package graft.gen

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Machine, SensorTemplate}

/** Synthetic IIoT sensor generator (SURVEY §2 A3-A5, C5, C6).
  *
  * Reference behavior: 4 machines × 4 sensor templates, Gaussian values
  * rounded to 2 dp (`ingestion/ingest_data.py:19-31,63-70`); 7-day
  * hourly backfill = 2,688 messages (`:90-118`); 5-second live ticks of
  * 16 messages (`:129-146`).
  *
  * Spark-first design: the time grid is `sequence()` cross-joined to
  * broadcast dims — fully distributed, no driver loop; values come from
  * `randn(seed)` so runs are deterministic under a fixed seed. The live
  * mode is the built-in `rate` source mapped onto the dims: at scale
  * you'd swap `rate` for the real broker source behind the same shape.
  */
object DataGen {

  /** Reference dims, verbatim (ingest_data.py:19-31). */
  val Machines: Seq[Machine] = Seq(
    Machine("CNC-001", "CNC Mill", "Assembly Line A"),
    Machine("LATHE-002", "Lathe", "Tooling Bay 2"),
    Machine("PRESS-003", "Hydraulic Press", "Stamping Area"),
    Machine("WELD-004", "Robotic Welder", "Line B"))

  val SensorTemplates: Seq[SensorTemplate] = Seq(
    SensorTemplate("temperature", 85.0, 5.0),
    SensorTemplate("vibration", 1.5, 0.5),
    SensorTemplate("pressure", 150.0, 10.0),
    SensorTemplate("power_draw", 1200.0, 50.0))

  def machineDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Machines.toDF()
  }

  def sensorDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    SensorTemplates.toDF()
  }

  /** Historical backfill: one reading per (machine, sensor, step) over
    * `days` at `stepSeconds` intervals ending at `end`. Distributed
    * time-grid explode — the reference's nested Python loops
    * (ingest_data.py:102-111) become one `sequence` + two broadcast
    * joins. 7d × 1h × 16 dims = 2,688 rows. */
  def backfill(
      spark: SparkSession,
      end: Instant,
      days: Int = 7,
      stepSeconds: Long = 3600L,
      seed: Long = 42L): DataFrame = {
    val endUs = end.toEpochMilli * 1000L
    val startUs = endUs - days.toLong * 86400L * 1000000L
    val grid = spark.range(1)
      .select(explode(sequence(
        lit(startUs), lit(endUs - 1), lit(stepSeconds * 1000000L))).as("tus"))
    val dims = machineDim(spark).crossJoin(sensorDim(spark))
    withGaussianValue(grid.crossJoin(broadcast(dims)), seed)
  }

  /** Live tick stream: the `rate` source (one row per tick) fanned out
    * to the 16 (machine, sensor) dims — 16 msgs / `intervalSeconds`,
    * the reference's steady state (A5). */
  def live(spark: SparkSession, intervalSeconds: Int = 5, seed: Long = 42L): DataFrame = {
    // rate accepts only integer rowsPerSecond — emit 1/s and keep every
    // intervalSeconds-th tick (the rate value is a monotonic counter)
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .filter(col("value") % intervalSeconds === 0)
      .select(unix_micros(col("timestamp")).as("tus"))
    val dims = machineDim(spark).crossJoin(sensorDim(spark))
    withGaussianValue(ticks.crossJoin(dims), seed)
  }

  /** Gaussian `value` (randn*σ+μ, 2 dp — C5) + ISO-8601 'T' timestamp
    * string (C6) — the producer's message shape. */
  private def withGaussianValue(grid: DataFrame, seed: Long): DataFrame =
    grid
      .withColumn("value", round(randn(seed) * col("stdDev") + col("mean"), 2))
      .withColumn("timestamp",
        date_format(timestamp_micros(col("tus")), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .select(col("timestamp"), col("machine_id"), col("sensor_type"),
        col("value"), col("tus"))
}
