package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/sharding for training-data
  * splits (SURVEY §7.5). Random sampling (`df.sample`) is neither
  * reproducible across engines nor stable at 100 TB — a retried task
  * resamples, and a re-run produces a different split. Hash sharding
  * keys every row by the md5-derived 60-bit hash of its own id
  * ([[Dedup.md5Hash60]] — the same oracle-portable family as the dedup
  * pipeline), so:
  *
  *  - the SAME rows land in the SAME shard in any engine with md5
  *    (the DuckDB oracle replicates the assignment bit-for-bit);
  *  - task retries and full re-runs are idempotent;
  *  - train/eval membership never migrates as the corpus grows — a
  *    row's shard depends only on its own key, never on corpus size.
  *
  * Map-side only: the shard expression is codegen'd scalar work and the
  * keep-filter sits directly above the scan — no shuffle at any scale.
  */
object Sampling {

  /** Shard index in [0, nShards) for a key column. md5Hash60 is a
    * uniform positive 60-bit value, so pmod == mod and the modulus is
    * unbiased for any practical shard count. */
  def shard(key: Column, nShards: Int): Column =
    pmod(Dedup.md5Hash60(key.cast("string")), lit(nShards.toLong))

  /** Deterministic keep/nShards fraction sample: rows whose shard index
    * falls below `keep`. The complement (shard >= keep) is the exact
    * disjoint remainder — train/eval splits from one call each. */
  def sampleShards(df: DataFrame, key: Column, nShards: Int, keep: Int): DataFrame =
    df.withColumn("shard", shard(key, nShards)).filter(col("shard") < keep)

  /** Weighted mixture sampling: each stratum keeps its own fraction —
    * the curriculum/mixture primitive (sample source A at 80%, B at
    * 25%, drop C) behind training-mix construction. Per-row keep test:
    * md5Hash60(key) < rate · 2⁶⁰, with the per-stratum rate joined in
    * as permille (exact integer threshold — a double rate could round
    * the boundary differently across engines).
    *
    * Same portability/idempotence contract as [[sampleShards]]
    * (membership depends only on the row's own key + its stratum's
    * rate), and the same 100 TB shape: the weights frame broadcasts,
    * the keep-filter rides the scan — no shuffle, no per-stratum
    * row_number sort anywhere. Strata absent from `weights` drop
    * (inner join = rate 0). */
  def mixtureSample(
      df: DataFrame, key: Column, stratum: Column, weights: DataFrame): DataFrame = {
    // threshold = permille · 2^60 / 1000, exact in Long: computed as
    // (2^60 div 1000)·permille + ((2^60 mod 1000)·permille) div 1000 —
    // integer `div` (not `/`, which is double in the Column DSL), so
    // both engines replicate the identical boundary.
    val base = (1L << 60) / 1000L
    val rem = (1L << 60) % 1000L
    val threshold = expr(s"permille * $base + (permille * $rem) div 1000")
    df.withColumn("__h", Dedup.md5Hash60(key.cast("string")))
      .join(broadcast(weights), df(stratum.toString) === weights("stratum"))
      .filter(col("__h") < threshold)
      .drop("stratum", "__h")
  }

  /** PPS (probability-proportional-to-size) Poisson sampling with a
    * Horvitz–Thompson stratum-total estimate (Ohlsson 1998's Poisson
    * πps family). Doc i is kept with p_i = min(1, k·size_i/W) — an
    * expected-k sample that over-represents the big items dominating
    * token budgets, where uniform sampling would be dominated by tiny
    * docs by count and miss the mass. The keep test is exact integer
    * (md5Hash60("pps:"+id)·W < k·size_i·2⁶⁰ in DECIMAL(38,0); HUGEINT
    * in the oracle) — no float probability ever exists — and
    * certainty items (k·size_i ≥ W) are kept outright. HT is where
    * PPS shines: each probabilistic keep contributes size/p = W/k to
    * the estimate, so est = certain_sum + HALF_UP(n_prob·W/k),
    * exact-integer and unbiased (relative SE ≈ 1/√k). Same contract
    * as the rest of this file: membership depends only on the row's
    * own id + stratum totals, so re-runs and engines agree
    * bit-for-bit. 100 TB shape: stratum totals broadcast, the keep
    * test rides the scan map-side, output is strata-sized. */
  def ppsSummary(docs: DataFrame, stratum: String, id: String, size: String,
      k: Long): DataFrame = {
    val two60 = lit(1152921504606846976L) // 2^60
    val strata = docs.groupBy(col(stratum))
      .agg(sum(col(size)).as("w_tot"), count(lit(1)).as("n_docs"))
    val tagged = docs.join(broadcast(strata), stratum)
      .withColumn("certain", lit(k) * col(size) >= col("w_tot"))
      .withColumn("keep", col("certain") ||
        (Dedup.md5Hash60(concat(lit("pps:"), col(id).cast("string")))
          .cast("decimal(38,0)") * col("w_tot").cast("decimal(38,0)") <
         (lit(k) * col(size)).cast("decimal(38,0)") * two60.cast("decimal(38,0)")))
    tagged.groupBy(col(stratum), col("w_tot"), col("n_docs"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("certain"), 1L).otherwise(0L)).as("n_certain"),
        sum(when(col("certain"), col(size)).otherwise(0L)).as("certain_chars"))
      .selectExpr(stratum, "n_docs", "n_kept", "n_certain",
        "w_tot AS true_chars",
        s"""certain_chars + (2 * (n_kept - n_certain) * w_tot + $k)
           |  div (2 * $k) AS est_chars""".stripMargin)
  }
}
