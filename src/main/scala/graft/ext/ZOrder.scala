package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-dimensional data skipping.
  *
  * Parquet/lake scans prune files by per-file min/max statistics. A table
  * sorted by ONE column skips well on that column and not at all on any
  * other; interleaving the bits of two (or more) sort dimensions gives a
  * space-filling curve whose contiguous ranges are small rectangles in
  * (x, y) space — files hold tight bounding boxes on BOTH columns, so
  * selective predicates on either dimension prune (the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
  *
  * The key is pure bit arithmetic over built-ins (shiftright / bitwise
  * AND / shiftleft / bitwise OR) — whole-stage codegen'd, map-side, no
  * UDF — and the same expression is generated as ANSI SQL for the DuckDB
  * oracle by [[interleave16Sql]] from the SAME bit loop, so engine and
  * oracle cannot drift.
  *
  * At 100 TB the write path is `repartitionByRange(zkey)` +
  * `sortWithinPartitions(zkey)` ([[clusterWrite]]): the range exchange
  * samples key quantiles so output files are even-sized, and the sort is
  * per-partition (no global sort barrier beyond the range exchange
  * itself).
  */
object ZOrder {

  /** 32-bit Morton code: bit i of `x` lands at position 2i, bit i of
    * `y` at 2i+1. Inputs are masked to their low 16 bits, so any long
    * is safe; callers wanting full-width dimensions normalize first
    * (e.g. `pmod(col, lit(65536L))` or a rank-bucket). */
  def interleave16(x: Column, y: Column): Column = {
    val terms = (0 until 16).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The identical Morton expression as engine-portable SQL (DuckDB /
    * ANSI bit operators), generated from the same loop as
    * [[interleave16]]. */
  def interleave16Sql(x: String, y: String): String = {
    val terms = (0 until 16).flatMap { i =>
      Seq(
        s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` z-order-clustered on (x, y): range-partition by the
    * Morton key into `numFiles` even buckets (sampled quantiles — no
    * skew from dense key regions), sort within each, drop the key, and
    * write parquet. Files then carry tight min/max boxes on BOTH x and
    * y, so either predicate prunes at scan time. */
  def clusterWrite(df: DataFrame, x: Column, y: Column, numFiles: Int,
      path: String): Unit =
    df.withColumn("__zkey", interleave16(x, y))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
}
