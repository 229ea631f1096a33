package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch anomaly-run detection — the gaps-and-islands formulation of
  * [[graft.stream.Stateful.anomalyRuns]] ("alert when a sensor is out
  * of range for ≥ minRun consecutive readings"). The streaming op keeps
  * O(keys) state; the batch op is two ranking windows over one sort:
  *
  *   island = row_number() OVER (key ORDER BY t)
  *          - row_number() OVER (key, flag ORDER BY t)
  *
  * Consecutive same-flag rows share an island id; grouping flagged rows
  * by island yields each run in one shuffle + one aggregate.
  *
  * Scale notes: both window functions share ONE partition sort (same
  * partition-by prefix and ordering), so the cost is a single shuffle
  * of the readings by key, then map-side codegen'd ranking; the run
  * aggregate combines partially. Determinism: ordering includes a
  * unique tiebreak column so island assignment is total.
  */
object Runs {

  /** @param lo/hi   inclusive in-range bounds per reading value
    * @param minRun  keep runs with at least this many readings
    * @param keys    run grouping keys (e.g. machine, sensor)
    * @param ts      event-time column (epoch micros)
    * @param tie     unique tiebreak column for deterministic ordering
    * @return one row per run: keys*, run_length, start_us, end_us
    */
  def anomalyRuns(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      tie: Column,
      value: Column,
      lo: Double,
      hi: Double,
      minRun: Int): DataFrame = {
    val flag = (value < lo || value > hi).as("flag")
    val all = Window.partitionBy(keys: _*).orderBy(col("tus"), col("tie"))
    val byFlag = Window.partitionBy(keys :+ col("flag"): _*).orderBy(col("tus"), col("tie"))
    df.select(keys :+ ts.as("tus") :+ tie.as("tie") :+ flag: _*)
      .withColumn("island", row_number().over(all) - row_number().over(byFlag))
      .filter(col("flag"))
      .groupBy(keys :+ col("island"): _*)
      .agg(count(lit(1)).as("run_length"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .filter(col("run_length") >= minRun)
      .drop("island")
  }
}
