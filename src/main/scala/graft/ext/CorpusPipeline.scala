package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation pipeline — the COMPOSITION of
  * the individually-gated stages, in the order a real training-data
  * run executes them:
  *
  *   quality filter → URL dedup → exact-text dedup → near dedup
  *   (MinHash LSH → connected components) → decontamination (eval
  *   split out + contaminated train docs dropped) → mixture sampling
  *   → sequence packing
  *
  * Every stage exists elsewhere as its own oracled query
  * (quality_filter, url_dedup, dedup_exact, dedup_corpus,
  * contam_check, mixture_sample, pack_sequences); this module chains
  * the SURVIVOR SETS, which is the one thing the per-stage gates
  * cannot verify — interface drift between stages (a renamed column,
  * a filter applied to the wrong side, an id space collision) only
  * surfaces end-to-end. The final packed table's offsets depend on
  * the exact survivor set per shard, so the full chain hash-gates
  * through `corpus_pipeline`'s DuckDB oracle.
  *
  * 100 TB shape, stage by stage: the corpus parquet is scanned ONCE
  * into the checkpointed base (the bronze seam — each synth branch
  * and stage reads those blocks, never the file again; PlanSpec
  * asserts no stage plan re-scans the source). Quality and the URL
  * canonicalization ride map-side; URL and exact dedup are one
  * hash-shuffle each on their dedup key; the LSH candidate machinery
  * is Dedup.minhashPairs (banded, bucket-capped) with the CC loser
  * set BROADCAST back (the corpus never shuffles for dedup); the
  * contamination probe broadcasts the eval shingle set; mixture
  * weights broadcast; packing is one window over (shard, hash) —
  * nothing corpus-sized crosses an exchange except the two dedup-key
  * shuffles and the packing sort.
  */
object CorpusPipeline {

  /** Stage frames, exposed for plan-level assertions and reuse. */
  final case class Stages(
      base: DataFrame, aug: DataFrame, afterQuality: DataFrame,
      afterUrlDedup: DataFrame, afterExactDedup: DataFrame,
      afterNearDedup: DataFrame, afterDecontam: DataFrame,
      afterMixture: DataFrame, packed: DataFrame)

  /** Build the full pipeline over a documents frame
    * (doc_id, text, source).
    *
    * The planted artifacts (every byte derived from the read-only
    * corpus — the withNearDups/messyUrls convention) give each stage
    * real work at any SF:
    *  - +2e9: 2-token truncations        → quality drops (too_short)
    *  - +5e9: same page, messy URL       → URL dedup drops
    *  - +6e9: same text, distinct URL    → exact-text dedup drops
    *  - +1e9: last-3-tokens-off copies   → near dedup drops
    *  - +7e9: 20-token quotes + filler   → decontamination drops the
    *    ones quoting an EVAL-shard doc (low Jaccard: not near-dups)
    */
  def build(docs: DataFrame): Stages = {
    // ONE corpus scan; every branch below reads these blocks.
    val base = docs.select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint(true)
    val toks = TextOps.tokens(col("text"))
    val short = base.select((col("doc_id") + 2000000000L).as("doc_id"),
      concat_ws(" ", slice(toks, 1, 2)).as("text"), col("source"))
    val exactUrl = base.select((col("doc_id") + 5000000000L).as("doc_id"),
      col("text"), col("source"))
    val exactText = base.select((col("doc_id") + 6000000000L).as("doc_id"),
      col("text"), col("source"))
    val nearDup = base.select((col("doc_id") + 1000000000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 3, lit(1))))
        .as("text"), col("source"))
    // Two-step select: the filler tokens must carry the BASE id, and
    // a one-step select would resolve col("doc_id") to the freshly
    // aliased +7e9 column (Spark's lateral column alias precedence).
    val quote = base
      .select(col("doc_id").as("base_id"), col("text"), col("source"))
      .select((col("base_id") + 7000000000L).as("doc_id"),
        concat(concat_ws(" ", slice(toks, 1, 20)), lit(" "),
          concat_ws(" ", transform(sequence(lit(1), lit(20)),
            k => concat(lit("zq"), col("base_id").cast("string"), lit("x"),
              k.cast("string"))))).as("text"), col("source"))
    val aug = base.unionByName(short).unionByName(exactUrl)
      .unionByName(exactText).unionByName(nearDup).unionByName(quote)

    // 1. quality filter (C4-style rule chain, map-side)
    val s1 = aug.filter(QualityFilter.keep(col("text")))

    // 2. URL dedup: canonicalize the synthesized spelling, keep the
    // lowest doc_id per canonical URL (one shuffle on the URL key).
    // The +5e9 copies carry the SAME logical page id under a messy
    // spelling (SHOUTED scheme/host, www., :80) — normalize collapses
    // them onto their original.
    val exactUrlCopy =
      col("doc_id") >= 5000000000L && col("doc_id") < 6000000000L
    val pid = when(exactUrlCopy, col("doc_id") - 5000000000L)
      .otherwise(col("doc_id"))
    val url = when(exactUrlCopy,
      concat(lit("HTTPS://WWW.Site"), pmod(pid, lit(7L)).cast("string"),
        lit(".COM:80/p/"), pid.cast("string")))
      .otherwise(
        concat(lit("https://site"), pmod(pid, lit(7L)).cast("string"),
          lit(".com/p/"), pid.cast("string")))
    val s2 = s1.withColumn("__canon", UrlOps.normalize(url))
      .withColumn("__keep",
        min(col("doc_id")).over(Window.partitionBy(col("__canon"))))
      .filter(col("doc_id") === col("__keep")).drop("__canon", "__keep")

    // 3. exact-text dedup on the normalized text (one shuffle on the
    // text key). Checkpointed: feeds the LSH machinery AND the
    // survivor anti-join.
    val s3 = s2.withColumn("__keep",
        min(col("doc_id")).over(Window.partitionBy(lower(trim(col("text"))))))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
      .localCheckpoint(true)

    // 4. near dedup: LSH pairs → CC → drop non-canonical members.
    // The loser set is CC output (duplicate-count-sized) — broadcast.
    val pairs = Dedup.minhashPairs(s3, col("doc_id"), col("text"),
      threshold = 0.5)
    val groups = Dedup.dedupGroups(pairs, col("doc_a"), col("doc_b"))
    val losers = groups.filter(col("node") =!= col("group"))
      .select(col("node").as("doc_id"))
    val s4 = s3.join(broadcast(losers), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // 5. decontamination: shards [0,2) of 20 are the EVAL split —
    // removed from the training corpus — and any train doc sharing
    // ≥ 20% of its distinct shingles with eval drops too (exact
    // integer test 5·n_contam ≥ n_shingles; the quote plants quoting
    // an eval doc trip exactly this). Eval shingles broadcast.
    val rows = Contamination.shingleShardRows(s4, col("doc_id"), col("text"))
    val evalSh = rows.filter(col("shard") < 2).select(col("sh")).distinct()
    val contaminated = rows.filter(col("shard") >= 2)
      .select(col("doc"), col("sh")).distinct()
      .join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("sh"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0L))).as("n_c"))
      .filter(col("n_c") * 5 >= col("n_sh"))
      .select(col("doc").as("doc_id"))
    val s5 = s4.filter(Sampling.shard(col("doc_id"), 20) >= 2)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")

    // 6. mixture sampling: per-source permille derived from the
    // corpus (mixture_sample's convention), weights broadcast,
    // keep test rides the scan.
    val weights = s5.select(col("source")).distinct()
      .select(col("source").as("stratum"),
        ((substring(col("source"), 4, 10).cast("int") % 4 + 1) * 200)
          .as("permille"))
    val s6 = Sampling.mixtureSample(s5, col("doc_id"), col("source"), weights)

    // 7. sequence packing: the artifact a training run consumes.
    val packed = Packing.packOffsets(s6, col("doc_id"),
      size(TextOps.tokens(col("text"))), nShards = 8, seqLen = 256)

    Stages(base, aug, s1, s2, s3, s4, s5, s6, packed)
  }
}
