package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical time-series operator Spark
  * lacks natively (SURVEY §4.3 ladder tier a: composed from built-ins).
  *
  * For each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key — "the last sensor config /
  * reading known at event time".
  *
  * Implementation: tag both sides, union, and run one
  * `last(value, ignoreNulls)` window ordered by (ts, side) per key —
  * right rows sort before left rows at equal timestamps so `<=`
  * semantics hold. Cost: ONE shuffle + sort over left+right (the
  * classic distributed as-of), versus the naive approach's per-row
  * range join. At 100 TB both sides shuffle by key once; no broadcast,
  * no quadratic blowup; skewed keys fall to AQE or upstream salting.
  */
object AsOf {

  /** @param left  (key, ts, leftCols...)
    * @param right (key, ts, valueCol)
    * @return left rows + `asof_ts` + `asof_value` (NULL when no right
    *         row at or before the left timestamp)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__rts", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast("double"))
    val r = right.select(
      col(key),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(rightTs).as("__rts"),
      col(rightVal).cast("double").as("__rv"))
    val lCols = l.columns.filterNot(r.columns.contains)
    val rPadded = lCols.foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(l.schema(c).dataType)))

    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // a right row AT the left timestamp is visible to it (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rPadded.select(l.columns.map(col).toSeq: _*))
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .withColumn("asof_value", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__ts", "__rts", "__rv")
  }
}
