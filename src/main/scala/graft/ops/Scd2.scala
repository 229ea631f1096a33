package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 interval construction — turn a keyed change log into
  * validity intervals (`valid_from`, `valid_to`, `is_current`). The lake
  * half of CDC ingestion: upserts arrive as append-only change rows
  * (the reference's JDBC extract is exactly such a snapshot feed,
  * timescale_to_deltalake.py:29-31); history tables need each version's
  * effective range, and "latest snapshot" is then just
  * `WHERE is_current` (the engine's `latest_per_key` is the max_by
  * fast path for that projection).
  *
  * One window function: `valid_to = lead(ts) OVER (key ORDER BY ts, tie)`
  * — the next version's start closes this version's range; NULL means
  * still current. Single shuffle + sort on the business key; at 100 TB
  * the change log is already date-partitioned so the exchange reads
  * only the keys' deltas, and no self-join materializes (the naive
  * formulation joins the table to itself on key + "next ts" and pays a
  * second shuffle plus a range probe).
  *
  * Determinism: the ordering carries a unique tiebreak so simultaneous
  * versions of one key order totally — both engines pick the same
  * `lead` row.
  */
object Scd2 {

  /** @param key  business key columns
    * @param ts   version effective-time column (epoch micros)
    * @param tie  unique tiebreak column (e.g. the change row id)
    * @param attrs tracked attribute columns, carried through unchanged
    * @return one row per version: key*, tie, attrs*, valid_from_us,
    *         valid_to_us (NULL = open), is_current
    */
  def intervals(
      df: DataFrame,
      key: Seq[Column],
      ts: Column,
      tie: Column,
      attrs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(col("valid_from_us"), col("tie"))
    df.select(key ++ Seq(ts.as("valid_from_us"), tie.as("tie")) ++ attrs: _*)
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
