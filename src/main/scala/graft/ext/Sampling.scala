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
}
