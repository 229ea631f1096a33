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
}
