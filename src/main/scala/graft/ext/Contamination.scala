package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (SURVEY §7.5 extension): flag
  * training documents that share word n-grams with a held-out
  * evaluation set — the decontamination pass every serious pre-training
  * pipeline runs (GPT-3 §C / PaLM-style n-gram overlap).
  *
  * The eval membership is the same deterministic md5 sharding as
  * [[Sampling]] (engine-portable, growth-stable), so the split itself
  * is part of the reproducible contract, not a config knob.
  *
  * Scale shape: shingling is the map-side [[Dedup.shingleRows]] pipeline
  * (posexplode, zero shuffle); shingles are compared as 60-bit md5
  * hashes, never as strings. The eval side of the join is a real
  * benchmark suite — thousands of documents, i.e. a few million distinct
  * shingle hashes — so it is BROADCAST and the 100 TB training side
  * never shuffles: the probe rides the scan, and the per-doc rollup is
  * an ordinary partial+final count. If the eval set ever outgrew
  * broadcast range, the fallback is a shuffle join with a bloom-filter
  * pre-probe on the train side; the broadcast form is the correct
  * default and the one implemented.
  */
object Contamination {

  /** @param nShards   shard modulus for the eval split
    * @param evalKeep  shards [0, evalKeep) form the eval set
    * @param n         word n-gram order
    * @return one row per TRAIN doc with at least one distinct shingle:
    *         doc_id, n_shingles (distinct), n_contam (distinct shingles
    *         also present in eval), contam_frac (4 dp)
    */
  /** (doc, shard, sh) shingle-hash rows — the shared derivation under
    * [[check]] and [[Bloom.contamPreProbe]] (one definition so both
    * probes always measure the SAME eval/train split and hash). */
  def shingleShardRows(docs: DataFrame, id: Column, text: Column,
      nShards: Int = 20, n: Int = 3): DataFrame =
    // Round 21 (guide §1.2 step 2): the ShingleMd5 kernel — one JVM
    // call per doc streaming token bytes through a cached
    // MessageDigest — replaces the per-window string build +
    // md5-hex + conv chain. Bit-identical values by the kernel's
    // contract (ShingleMd5.scala:13), same row multiset as
    // Dedup.shingleRows (every w-window in order; < n tokens ⇒ no
    // rows either way).
    Dedup.rebalance(docs)
      .select(id.as("doc"), TextOps.tokens(text).as("toks"))
      .select(col("doc"),
        Sampling.shard(col("doc"), nShards).as("shard"),
        explode(graft.ext.expr.ShingleMd5.shingleMd5(col("toks"), n))
          .as("sh"))

  def check(docs: DataFrame, id: Column, text: Column,
      nShards: Int = 20, evalKeep: Int = 2, n: Int = 3): DataFrame = {
    val rows = shingleShardRows(docs, id, text, nShards, n)
    // The shard filter references only `doc`, so Catalyst pushes it
    // below the explode — the eval branch shingles only eval docs.
    val evalSh = rows.filter(col("shard") < evalKeep)
      .select(col("sh")).distinct()
    val train = rows.filter(col("shard") >= evalKeep)
      .select(col("doc"), col("sh")).distinct()
    // Broadcast LEFT probe with a hit marker, then ONE partial+final
    // aggregate for both counts — the train side is scanned once, and
    // no per-doc join of two aggregates is needed.
    train.join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("sh"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contam"))
      .select(col("doc").as("doc_id"), col("n_shingles"), col("n_contam"),
        round(col("n_contam").cast("double") / col("n_shingles"), 4)
          .as("contam_frac"))
  }
}
