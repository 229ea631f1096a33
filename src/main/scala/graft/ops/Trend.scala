package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key least-squares trend (slope) over integer-encoded series —
  * the "is this sensor drifting?" primitive behind predictive
  * maintenance on the reference's sensor streams (machine degradation
  * shows up as a value trend long before a threshold alert fires).
  *
  * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * Determinism contract (same discipline as the engine's decimal money
  * sums): callers pass x and y as LONG-encoded columns (e.g. minutes
  * since epoch, centi-units), so all five sufficient statistics are
  * exact integer sums — order-independent under any partial-aggregation
  * schedule. The closed-form products are computed in DECIMAL(38,0)
  * (n·Σxy overflows int64 once groups reach ~10⁸ rows of wide-range x)
  * and only the final slope division happens in floating point: one
  * IEEE division of identical exact operands in any engine.
  *
  * 100 TB shape: one partial+final HashAggregate over the scan — the
  * five sums are algebraic, so the raw series crosses the exchange as
  * ≤ one row per key per partition. No window, no sort, no join.
  */
object Trend {

  /** @param keys group columns (simple named columns)
    * @param x    long-encoded abscissa (e.g. minutes since a fixed epoch)
    * @param y    long-encoded ordinate (e.g. value scaled to centi-units)
    * @return keys*, n, plus `slope` rounded to 8 dp (null for degenerate
    *         groups: n < 2 or constant x)
    */
  def slope(df: DataFrame, keys: Seq[Column], x: Column, y: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // sums accumulate in DECIMAL(38,0), not long: n·Σx² for a billion-
    // row group of day-granularity minutes overflows int64 silently,
    // while the oracle engine auto-promotes its sums to int128 — the
    // one place the two engines could diverge at scale. The per-row
    // PRODUCTS stay long (bounded by the caller's encoding contract).
    df.select(keys :+ x.as("x") :+ y.as("y"): _*)
      .groupBy(keys.map(c => col(c.toString)): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
      .withColumn("num",
        col("n").cast(dec) * col("sxy").cast(dec) - col("sx").cast(dec) * col("sy").cast(dec))
      .withColumn("den",
        col("n").cast(dec) * col("sxx").cast(dec) - col("sx").cast(dec) * col("sx").cast(dec))
      // slope at 8 dp via EXACT integer HALF_UP: round(double/double)
      // straddles engines on half-point boundary rows (round-5 sf0.01
      // hash fail). den > 0 whenever non-degenerate (Cauchy-Schwarz),
      // so only num needs the half-away-from-zero sign split; both
      // operands of the integral division are non-negative, where
      // Spark's truncating `div` and DuckDB's floor `//` coincide. The
      // closing cast-to-double and /1e8 are the same IEEE ops on the
      // same exact integer in any engine.
      .withColumn("slope",
        when(col("den") =!= 0,
          when(col("num") >= 0,
            expr("(2 * num * 100000000 + den) div (2 * den)"))
            .otherwise(-expr("(2 * (-num) * 100000000 + den) div (2 * den)"))
            .cast("double") / lit(1e8)))
      .drop("num", "den")
  }
}
