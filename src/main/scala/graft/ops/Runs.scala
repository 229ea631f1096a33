package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch anomaly-run detection — the gaps-and-islands formulation of
  * [[graft.stream.Stateful.anomalyRuns]] ("alert when a sensor is out
  * of range for ≥ minRun consecutive readings"). The streaming op keeps
  * O(keys) state; the batch op marks flag-change boundaries with lag()
  * and turns a running sum of boundaries into the island id:
  *
  *   boundary = flag ≠ lag(flag)         (first row counts as one)
  *   island   = SUM(boundary) OVER (key ORDER BY t ROWS UNBOUNDED PRECEDING)
  *
  * Both window functions use the SAME partitioning and ordering, so
  * Catalyst plans them in one Window operator over ONE shuffle + sort
  * (PlanSpec asserts a single Exchange). The textbook alternative —
  * rn OVER (key) − rn OVER (key, flag) — partitions two different ways
  * and pays a second full shuffle. The run aggregate after the filter
  * combines partially. Determinism: ordering includes a unique
  * tiebreak column so island assignment is total.
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
    val w = Window.partitionBy(keys: _*).orderBy(col("tus"), col("tie"))
    val boundary =
      when(lag(col("flag"), 1).over(w).isNull ||
        lag(col("flag"), 1).over(w) =!= col("flag"), 1L).otherwise(0L)
    df.select(keys :+ ts.as("tus") :+ tie.as("tie") :+ flag: _*)
      .withColumn("island", sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("flag"))
      .groupBy(keys :+ col("island"): _*)
      .agg(count(lit(1)).as("run_length"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .filter(col("run_length") >= minRun)
      .drop("island")
  }
}
