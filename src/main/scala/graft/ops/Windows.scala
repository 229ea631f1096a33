package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window aggregations — the reference's core computation.
  *
  * Reference behavior: 1-minute tumbling AVG/MIN/MAX/COUNT grouped by
  * (machine_id, sensor_type) (`flink-jobs/sensor_aggregation.py:83-98`),
  * plus the required 1-min/30-s sliding (HOP) variant
  * (`sensor_aggregation.py:100-117`; SURVEY §2 F1/F2). One operator
  * definition serves batch and streaming (F3) — the streaming path adds
  * `withWatermark` upstream and runs the same expressions.
  *
  * Scale notes (100 TB): both forms compile to a partial+final
  * `HashAggregateExec` pair — map-side combine collapses each window's
  * rows before the shuffle, so shuffle volume is O(groups), not O(rows).
  * The epoch-long variant keeps the whole pipeline in whole-stage codegen
  * with pure long arithmetic (no timestamp boxing). Sliding windows
  * multiply input by window/slide — the explode happens *before* the
  * partial agg, which still combines map-side; at scale prefer the
  * epoch-long form so the multiplier stays in codegen.
  */
object Windows {

  /** Standard AVG/MIN/MAX/COUNT aggregate set (F4). `avg` is rounded to
    * 4 dp for cross-engine float determinism (oracle parity). */
  def standardAggs(value: Column): Seq[Column] = Seq(
    round(avg(value), 4).as("avg_value"),
    min(value).as("min_value"),
    max(value).as("max_value"),
    count(lit(1)).as("count_readings")
  )

  /** Tumbling-window agg over an epoch-long time column (exact integer
    * bucket math — the scale path). `window_start_us = t - t mod w`. */
  def tumblingAggUs(
      df: DataFrame,
      tsUs: Column,
      windowUs: Long,
      keys: Seq[Column],
      value: Column): DataFrame = {
    val start = (tsUs - tsUs % windowUs).as("window_start_us")
    df.groupBy(start +: keys: _*).agg(standardAggs(value).head, standardAggs(value).tail: _*)
  }

  /** Sliding (HOP) window agg over an epoch-long time column. Each row
    * lands in `windowUs / slideUs` windows (F2 semantics: duplication is
    * the point — verified by multiplicity tests). */
  def slidingAggUs(
      df: DataFrame,
      tsUs: Column,
      windowUs: Long,
      slideUs: Long,
      keys: Seq[Column],
      value: Column): DataFrame = {
    require(windowUs % slideUs == 0, "window must be a multiple of slide")
    val n = windowUs / slideUs
    // starts: s0 - k*slide for k in [0, n), where s0 = t - t mod slide.
    // explode before aggregation; map-side combine still applies.
    val s0 = tsUs - tsUs % slideUs
    val starts = sequence(lit(0L), lit(n - 1)).as("ks")
    val exploded = df
      .withColumn("ks", starts)
      .withColumn("k", explode(col("ks")))
      .withColumn("window_start_us", s0 - col("k") * slideUs)
      .drop("ks", "k")
    exploded
      .groupBy(col("window_start_us") +: keys: _*)
      .agg(standardAggs(value).head, standardAggs(value).tail: _*)
  }

  /** Timestamp-typed tumbling/sliding agg via built-in `window()` —
    * used by the streaming pipeline (same expression under a watermark)
    * and the batch≡stream equivalence tests. Flattens the window struct
    * to `window_start`/`window_end` like the reference's sink schema
    * (`init-db.sql:24-33`). */
  def windowedAgg(
      df: DataFrame,
      eventTime: Column,
      size: String,
      slide: Option[String],
      keys: Seq[Column],
      value: Column): DataFrame = {
    val win = slide match {
      case Some(sl) => window(eventTime, size, sl)
      case None     => window(eventTime, size)
    }
    df.groupBy(win.as("window") +: keys: _*)
      .agg(standardAggs(value).head, standardAggs(value).tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }
}
