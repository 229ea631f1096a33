package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification + forward fill ("gap filling").
  *
  * The reference stores sensor readings in TimescaleDB hypertables
  * (infrastructure setup/init-db.sql:6-16) whose downstream consumers
  * lean on `time_bucket_gapfill`/`locf` — a sparse sensor stream must
  * become a dense per-bucket series before charting, joining against
  * other series, or feeding a model. This is that operator, Spark-shaped.
  *
  * Design: gap rows are generated BETWEEN consecutive observed buckets,
  * not joined against a pre-built grid:
  *
  *   1. bucket aggregate: groupBy(key, bucket) — ONE exchange over the
  *      raw events, partial+final HashAggregate. The only full-input
  *      stage.
  *   2. lead(bucket) over (key ORDER BY bucket) on the collapsed frame
  *      (keys × observed buckets): one more exchange + sort, but of the
  *      COLLAPSED frame only — hash(key, bucket) does not satisfy the
  *      window's key-clustering, and forcing a shared key-partitioning
  *      up front would shuffle raw events without map-side reduction,
  *      strictly worse at scale.
  *   3. explode(sequence(bucket, next−step)) — each observation emits
  *      itself plus its trailing gap rows, CARRYING its own aggregate,
  *      so forward fill (`filled_value`) needs no window over the dense
  *      grid and no ignoreNulls scan-back.
  *
  * A naive grid-and-join formulation (per-key min/max → dense sequence →
  * left join → last(ignoreNulls) window) costs a second full scan of
  * the input — Catalyst collapses the bounds aggregate straight onto
  * the raw relation (min of per-bucket mins = min, so the "reuse the
  * bucket aggregate" intent is optimized away) — plus a join and a
  * second window sort over the DENSE grid. This shape was measured in
  * this repo before being replaced; the lead/sequence form scans once,
  * shuffles once, sorts once, joins never.
  *
  * 100 TB shape: the raw corpus crosses exactly one exchange (algebraic
  * agg). Everything after runs on |keys|×|observed buckets| rows. A
  * per-row sequence() is bounded by that observation's own gap span —
  * one dead sensor generates its gap rows across tasks that own its
  * neighboring observations, never a driver-side or single-task blowup.
  */
object GapFill {

  /** Densify per-key bucketed aggregates onto a contiguous grid
    * (covering each key's observed span) and forward-fill gaps.
    *
    * @param df       input events
    * @param keys     series keys (simple named columns, e.g. machine id)
    * @param ts       event-time column, epoch micros
    * @param value    measurement to aggregate per bucket
    * @param bucketUs grid step in microseconds
    * @return one row per key per grid bucket: keys*, bucket_us,
    *         n_events (0 on gap buckets), avg_value (null on gaps),
    *         filled_value (last observed avg at-or-before the bucket)
    */
  def hourlyFill(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      value: Column,
      bucketUs: Long): DataFrame = {
    val keyNames = keys.map(_.toString)
    val keyCols = keyNames.map(col)
    // 1. sparse per-bucket aggregate — the only full-input pass.
    val perBucket = df
      .select(keys :+ ts.as("tus") :+ value.as("v"): _*)
      .groupBy(keyCols :+ (col("tus") - pmod(col("tus"), lit(bucketUs))).as("obs_us"): _*)
      .agg(count(lit(1)).as("n_obs"), round(avg(col("v")), 4).as("avg_obs"))

    // 2+3. each observation expands to itself + the gap buckets before
    // the key's next observation, carrying its aggregate as the fill.
    val w = Window.partitionBy(keyCols: _*).orderBy(col("obs_us"))
    perBucket
      .withColumn("next_us", lead(col("obs_us"), 1).over(w))
      .select(keyCols ++ Seq(
        explode(sequence(col("obs_us"),
          coalesce(col("next_us") - bucketUs, col("obs_us")), lit(bucketUs)))
          .as("bucket_us"),
        col("obs_us"), col("n_obs"), col("avg_obs")): _*)
      .select(keyCols ++ Seq(
        col("bucket_us"),
        when(col("bucket_us") === col("obs_us"), col("n_obs")).otherwise(0L)
          .as("n_events"),
        when(col("bucket_us") === col("obs_us"), col("avg_obs")).as("avg_value"),
        col("avg_obs").as("filled_value")): _*)
  }

  /** Densify per-key bucketed means onto the gap grid and LINEARLY
    * INTERPOLATE between consecutive observations — TimescaleDB's
    * `interpolate()` companion to [[hourlyFill]]'s `locf`.
    *
    * Same three-stage shape (and the same 100 TB argument) as
    * [[hourlyFill]]: one algebraic aggregate over the raw input, one
    * collapsed-frame window for `lead`, then map-side explode. The only
    * difference is that each observation also carries the NEXT bucket's
    * mean so every gap row can close-form its interpolated value.
    *
    * Exactness: means and interpolation run on centi-value integers
    * (floor(value*100+0.5), the trend_slope/zscore encoding) with
    * signed HALF_UP integer division, so both engines produce identical
    * integers and the closing `/100.0` double is the same bits — no
    * float summation-order or rounding drift anywhere. Magnitudes:
    * |Δcenti| ≤ ~1e6 and gap spans ≤ ~1e12 µs, so the 2·|Δcenti|·span
    * numerator can reach ~2e18 — too close to the int64 edge (9.2e18)
    * to trust at cluster scale — hence the product is formed in
    * DECIMAL(38,0); the quotient (|q| ≤ |Δcenti|) narrows back to
    * long, so nothing can overflow or wrap.
    *
    * @return one row per key per grid bucket: keys*, bucket_us,
    *         observed (true on observation buckets), interp_cx
    *         (centi-value long), interp_value (double, = interp_cx/100)
    */
  def hourlyInterp(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      value: Column,
      bucketUs: Long): DataFrame = {
    val keyNames = keys.map(_.toString)
    val keyCols = keyNames.map(col)
    val perBucket = df
      .select(keys :+ ts.as("tus")
        :+ floor(value * 100 + lit(0.5)).cast("long").as("c"): _*)
      .groupBy(keyCols :+ (col("tus") - pmod(col("tus"), lit(bucketUs))).as("obs_us"): _*)
      .agg(count(lit(1)).as("n_obs"), sum(col("c")).as("sc"))
      // signed HALF_UP mean in centi-units (exact: sum and count are ints)
      .withColumn("cx",
        expr("""CASE WHEN sc >= 0 THEN (2 * sc + n_obs) div (2 * n_obs)
               |     ELSE -((2 * -sc + n_obs) div (2 * n_obs)) END""".stripMargin))

    val w = Window.partitionBy(keyCols: _*).orderBy(col("obs_us"))
    perBucket
      .withColumn("next_us", lead(col("obs_us"), 1).over(w))
      .withColumn("next_cx", lead(col("cx"), 1).over(w))
      .select(keyCols ++ Seq(
        explode(sequence(col("obs_us"),
          coalesce(col("next_us") - bucketUs, col("obs_us")), lit(bucketUs)))
          .as("bucket_us"),
        col("obs_us"), col("cx"), col("next_us"), col("next_cx")): _*)
      // gap rows: cx + HALF_UP((next_cx-cx)*(bucket-obs), next_us-obs) —
      // DECIMAL(38,0) product, long quotient (|q| ≤ |Δcenti|).
      .withColumn("interp_cx",
        when(col("bucket_us") === col("obs_us"), col("cx")).otherwise(
          col("cx") + expr(
            """CASE WHEN (next_cx - cx) >= 0
              |THEN (2 * CAST(next_cx - cx AS DECIMAL(38,0)) * (bucket_us - obs_us)
              |      + (next_us - obs_us)) div (2 * (next_us - obs_us))
              |ELSE -((2 * CAST(cx - next_cx AS DECIMAL(38,0)) * (bucket_us - obs_us)
              |        + (next_us - obs_us)) div (2 * (next_us - obs_us))) END"""
              .stripMargin).cast("long")))
      .select(keyCols ++ Seq(
        col("bucket_us"),
        (col("bucket_us") === col("obs_us")).as("observed"),
        col("interp_cx"),
        (col("interp_cx").cast("double") / 100.0).as("interp_value")): _*)
  }
}
