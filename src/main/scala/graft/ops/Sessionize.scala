package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — assign events to activity sessions separated
  * by an inactivity gap. The batch complement of the streaming
  * `session_window` path (stream/Pipeline J8): training-data and
  * behavioral pipelines sessionize historical logs far more often than
  * live streams, and the batch form must not rely on streaming state.
  *
  * Same single-sort gaps-and-islands shape as [[Runs.anomalyRuns]]:
  *
  *   boundary = ts − lag(ts) > gap   (first event of a key counts)
  *   session  = SUM(boundary) OVER (key ORDER BY ts ROWS UNBOUNDED PRECEDING)
  *
  * Both window functions share one partitioning + ordering (the frames
  * differ, so Catalyst plans two Window operators, but the second
  * pipelines on the first's sort): ONE shuffle + ONE sort total — the
  * textbook per-event self-join ("previous event within gap") would be
  * a range self-join that degenerates at scale. After the Windows, the
  * per-session rollup is an ordinary hash aggregate with map-side
  * partials.
  *
  * 100 TB shape: one hash exchange on the session key + one sort. Keys
  * are users/devices — high cardinality, so no skew salting needed; a
  * single hot key (a bot) bounds at its own event count, and the
  * aggregate after the filter is algebraic. Ordering includes a unique
  * tiebreak column so island assignment is total and deterministic.
  */
object Sessionize {

  /** @param keys  session grouping keys (e.g. user, device)
    * @param ts    event-time column (epoch micros)
    * @param tie   unique tiebreak column for deterministic ordering
    * @param gapUs inactivity gap closing a session, in microseconds
    * @return one row per session: keys*, session_start_us,
    *         session_end_us, n_events, duration_us
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      tie: Column,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(col("tus"), col("tie"))
    val boundary =
      when(lag(col("tus"), 1).over(w).isNull ||
        col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L).otherwise(0L)
    df.select(keys :+ ts.as("tus") :+ tie.as("tie"): _*)
      .withColumn("session", sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys :+ col("session"): _*)
      .agg(
        min(col("tus")).as("session_start_us"),
        max(col("tus")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("session_end_us") - col("session_start_us"))
      .drop("session")
  }

  /** Per-session ordered event-type PATH (clickstream path mining's
    * input): the same single-sort gaps-and-islands session assignment,
    * then each session's events concatenated in (ts, tie) order. The
    * ordered concatenation runs as array_sort(collect_list(struct)) —
    * struct sort order is field order, and `tie` is unique, so the
    * path string is total and deterministic in any engine/partition
    * layout (collect_list alone is arrival-ordered — never that).
    * Path length is bounded by session event count; a bot key bounds
    * at its own sessions like the base operator.
    *
    * @return keys*, session_start_us, n_events, path ("a>b>c") */
  def sessionPaths(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      tie: Column,
      typ: Column,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(col("tus"), col("tie"))
    val boundary =
      when(lag(col("tus"), 1).over(w).isNull ||
        col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L).otherwise(0L)
    df.select(keys :+ ts.as("tus") :+ tie.as("tie") :+ typ.as("typ"): _*)
      .withColumn("session", sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys :+ col("session"): _*)
      .agg(
        min(col("tus")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("tus"), col("tie"), col("typ")))),
            s => s.getField("typ")),
          ">").as("path"))
      .drop("session")
  }
}
