package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitors for pipeline governance: exact
  * two-sample Kolmogorov–Smirnov and Population Stability Index per
  * key, comparing a row-level A/B membership split (typically early vs
  * late deployment windows).
  *
  * Both are exact-integer end to end so the results hash-oracle across
  * engines (SparkEntry conventions): KS defers the common denominator
  * (na·nb) to one final HALF_UP division; PSI floors both logs to
  * 1e6-scaled BIGINTs from exact-integer ratios and divides per bin on
  * provably non-negative operands.
  *
  * 100 TB shape: raw rows collapse to a compressed (key, value) /
  * (key, bin) histogram in ONE partial+final aggregate before any
  * window or join; the cumulative pass rides distinct values per key,
  * the PSI tail rides the bin count. No row-level shuffle survives the
  * first aggregate.
  */
object Drift {

  /** Exact two-sample KS statistic per key.
    *
    * Input: one row per observation with a boolean A-side marker.
    * Output: (key, na, nb, d_num, d_x1e6) where
    * d_num = max over values of |nb·cumA − na·cumB| and
    * d_x1e6 = HALF_UP(1e6 · d_num / (na·nb)). Keys with an empty A or
    * B side are DROPPED (the statistic is undefined there — a null
    * from the 0-denominator division would silently degrade instead
    * of failing loudly; callers wanting those keys flagged should
    * anti-join against this output). The scaled-gap products keep
    * na·nb inside BIGINT — holds through ~3e9 rows per side per key;
    * the final division routes through DECIMAL(38,0) (the
    * Trend/GapFill convention) so the 1e6 report scaling costs no
    * headroom against that envelope.
    */
  def ks(df: DataFrame, key: Column, inA: Column, value: Column): DataFrame =
    ksFromCounts(df
      .select(key.as("k"), inA.as("in_a"), value.as("value"))
      .groupBy(col("k"), col("value"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb")),
      Seq("k"))

  /** KS from a pre-aggregated count frame: `cc` holds one row per
    * (keyCols…, value) with A-side count `ca` and B-side count `cb`
    * (zero on a side is natural — unlike PSI there is no smoothing;
    * the cumulative gap handles one-sided values exactly). The seam
    * the streaming monitor reuses on finalized window distributions
    * (the [[psiFromCounts]] convention). */
  def ksFromCounts(cc: DataFrame, keyCols: Seq[String]): DataFrame = {
    val kcols = keyCols.map(col)
    val byKey = Window.partitionBy(kcols: _*)
    val cum = Window.partitionBy(kcols: _*).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cc.withColumn("na", sum(col("ca")).over(byKey))
      .withColumn("nb", sum(col("cb")).over(byKey))
      .withColumn("gap",
        abs(col("nb") * sum(col("ca")).over(cum) -
            col("na") * sum(col("cb")).over(cum)))
      .groupBy(kcols ++ Seq(col("na"), col("nb")): _*)
      .agg(max(col("gap")).as("d_num"))
      .where(col("na") > 0 && col("nb") > 0)
      .selectExpr(keyCols ++ Seq("na", "nb", "d_num",
        // d_num can reach na·nb, so 2e6·d_num would overflow BIGINT
        // once na·nb > ~4.6e12; DECIMAL(38,0) keeps the HALF_UP exact
        // through the full na·nb ≤ 2⁶³ envelope of the gap products.
        "(2000000 * CAST(d_num AS DECIMAL(38,0)) + CAST(na AS DECIMAL(38,0)) * nb) div (2 * CAST(na AS DECIMAL(38,0)) * nb) AS d_x1e6"): _*)
  }

  /** PSI per key over fixed-width bins with add-1 smoothing on the
    * observed bin set.
    *
    * Per bin the contribution is (pA − pB)·ln(pA/pB) under smoothed
    * probabilities pA = (ca+1)/(na+v), pB = (cb+1)/(nb+v); both lns
    * floor to 1e6-scaled BIGINTs and the numerator
    * ((ca+1)(nb+v) − (cb+1)(na+v))·dln shares sign with dln by
    * monotonicity of x ↦ floor(x·1e6 + 0.5), so every per-bin HALF_UP
    * division runs on non-negative operands; the count-difference and
    * ln products run in DECIMAL(38,0) (they exceed Int64 around a few
    * 1e5 rows per side under concentrated drift — DECIMAL holds to
    * ~1e15 rows per side). Output: (key, na, nb, n_bins, psi_x1e6).
    */
  def psi(df: DataFrame, key: Column, inA: Column, value: Column,
      binWidth: Double): DataFrame = {
    val cc = df
      .select(key.as("k"), inA.as("in_a"),
        floor(value / binWidth).cast("long").as("bin"))
      .groupBy(col("k"), col("bin"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
    psiFromCounts(cc, Seq("k"))
  }

  /** PSI from a pre-binned count frame: `cc` holds one row per
    * (keyCols…, bin) with A-side count `ca` and B-side count `cb`
    * (zero-count bins on one side must be PRESENT as explicit 0s —
    * they are the drift signal). Grouping, smoothing, and the per-bin
    * HALF_UP terms are exactly [[psi]]'s; this seam exists so the
    * streaming monitor can reuse the identical math on finalized
    * window histograms. */
  def psiFromCounts(cc: DataFrame, keyCols: Seq[String]): DataFrame = {
    val kcols = keyCols.map(col)
    val tot = cc.groupBy(kcols: _*)
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("v"))
    def lnFloor(num: Column, den: Column): Column =
      floor(log(num.cast("double") / den.cast("double")) * 1e6 + 0.5)
        .cast("long")
    cc.join(tot, keyCols)
      .withColumn("dln",
        lnFloor(col("ca") + 1, col("na") + col("v")) -
          lnFloor(col("cb") + 1, col("nb") + col("v")))
      // num ≤ ~(n+v)², and the term numerator multiplies it by a
      // 1e6-scaled ln (|dln| up to ~ln(n)·1e6) — BIGINT would wrap
      // around a few 1e5 rows per side under concentrated drift, so
      // both products run in DECIMAL(38,0) end to end (headroom to
      // ~1e15 rows per side); the HALF_UP quotient narrows to BIGINT.
      .withColumn("num",
        (col("ca") + 1).cast("decimal(38,0)") * (col("nb") + col("v")) -
          (col("cb") + 1).cast("decimal(38,0)") * (col("na") + col("v")))
      .withColumn("term", expr(
        "(2 * num * dln + CAST(na + v AS DECIMAL(38,0)) * (nb + v)) div (2 * CAST(na + v AS DECIMAL(38,0)) * (nb + v))"))
      .groupBy(kcols ++ Seq(col("na"), col("nb"), col("v").as("n_bins")): _*)
      .agg(sum(col("term")).as("psi_x1e6"))
  }

  /** CUSUM change-point detection per key (Page 1954): the max
    * excursion of the mean-centered cumulative sum, with the
    * detection point — the IN-SERIES alarm beside [[ks]]/[[psi]]'s
    * two-window comparisons (those need the analyst to pick the
    * windows; CUSUM finds the shift's location itself).
    *
    * Exact-integer throughout: values quantize to centi-units
    * (floor(v·100 + 0.5) — identical IEEE ops in any engine), and
    * mean-centering avoids division entirely by scaling with n:
    * C_t = n·prefix_t − t·total, so C is the exact n-scaled centered
    * cumsum, E_t = C_t − min_{s≤t} C_s ≥ 0 its excursion,
    * d_num = max E_t, and the detection point is the EARLIEST
    * (time, tiebreak) attaining it — picked by max(struct(E, −t, −tb)),
    * partial-aggregable, no second sort. d_x100 = HALF_UP(d_num/n)
    * reports the excursion in centi-value units.
    *
    * Output: (key, n, d_num, cp_t, d_x100).
    *
    * 100 TB shape: one per-key ordered Window pass (row_number +
    * running sum + running min share ONE sort), then a struct-max
    * aggregate. The n-scaling keeps C inside BIGINT through ~1e8 rows
    * per key at centi-value magnitude ~1e5 (n²·v̄ < 2⁶³); beyond that,
    * route C through DECIMAL(38,0) — the pps_sample precedent — or
    * window the series first. */
  def cusum(df: DataFrame, key: Column, time: Column, tiebreak: Column,
      value: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(key.as("k"), time.as("t"), tiebreak.as("tb"),
      floor(value * 100 + 0.5).cast("long").as("vc"))
    val tot = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("s"))
    base.join(tot, "k")
      .withColumn("rn", row_number().over(w))
      .withColumn("c", col("n") * sum(col("vc")).over(run) -
        col("rn") * col("s"))
      .withColumn("e", col("c") - min(col("c")).over(run))
      .groupBy(col("k"), col("n"))
      .agg(max(struct(col("e"), (-col("t")).as("nt"), (-col("tb")).as("ntb")))
        .as("m"))
      .selectExpr("k", "n", "m.e AS d_num", "-m.nt AS cp_t",
        "(2 * m.e + n) div (2 * n) AS d_x100")
  }
}
