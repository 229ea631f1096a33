package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join — pairs within a bounded gap — as a bucketed
  * equi-join (SURVEY §4.3 ladder tier a).
  *
  * Spark plans a raw inequality join (`l.ts - gap < r.ts <= l.ts`) as a
  * BroadcastNestedLoopJoin: O(|L|·|R|) per key and a broadcast of one
  * whole side — unusable at scale. The standard fix: quantize time into
  * gap-sized buckets; a right row at bucket b can only match left rows
  * in buckets {b, b+1}, so exploding the right side into two bucket
  * copies turns the predicate into an equi-join on (key, bucket) —
  * hash-shuffle both sides, then re-check the exact bound. Cost:
  * 2× right rows through one shuffle; no nested loop anywhere.
  */
object RangeJoin {

  /** Pairs (left, right) with the same `key` and
    * `0 <= left.ts - right.ts < gapUs` ("right happened within gapUs
    * before left").
    *
    * @param left  frame with `key`, `leftTs` (epoch-micros long)
    * @param right frame with `key`, `rightTs`
    * @return all left columns + all right columns (right's renamed by
    *         caller beforehand to avoid collisions) + `gap_us`
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      gapUs: Long): DataFrame = {
    // pmod, not % — truncating % rounds toward zero for negative epochs
    // (pre-1970 timestamps), mis-aligning left buckets against the
    // right side's {b, b+gap} explode and silently dropping valid pairs
    val l = left.withColumn("__bucket", col(leftTs) - pmod(col(leftTs), lit(gapUs)))
    val r = right
      .withColumn("__b0", col(rightTs) - pmod(col(rightTs), lit(gapUs)))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + gapUs)))
      .drop("__b0")
    l.join(r, Seq(key, "__bucket"))
      .filter(col(rightTs) <= col(leftTs) && col(rightTs) > col(leftTs) - gapUs)
      .drop("__bucket")
      .withColumn("gap_us", col(leftTs) - col(rightTs))
  }
}
