package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data pipelines (SURVEY §7.5
  * extension; no reference analog — the reference has no text surface).
  *
  * Training consumes fixed-length token sequences; documents are
  * concatenated in a deterministic order and split at sequence
  * boundaries ("offset packing" — the standard GPT-style pre-training
  * layout). The operator assigns every document its byte-exact place in
  * that layout WITHOUT materializing the concatenation: each doc gets
  * its shard, its token offset within the shard's stream, and the
  * sequence (pack) index its first token lands in.
  *
  * Scale shape: a GLOBAL running sum would serialize the corpus through
  * one sorted partition — the non-starter at 100 TB. Instead documents
  * are hash-sharded first ([[Sampling.shard]] — deterministic,
  * engine-portable md5 keying), and the running sum is per-shard: ONE
  * hash exchange on the shard id + ONE sort per shard, each shard an
  * independent token stream (exactly how multi-worker loaders consume
  * packed data). Shard count scales with the cluster, not the corpus;
  * ordering inside a shard is (md5-hash, id) — deterministic AND
  * decorrelated from ingest order, so shard streams are statistically
  * uniform and no shard becomes the straggler.
  *
  * Within a shard, `offset_toks` is the exclusive running token sum and
  * `pack_seq = offset_toks div seqLen` — the index of the fixed-length
  * sequence where the document starts. Documents may straddle a pack
  * boundary (they are split at consumption time, as in production
  * loaders); greedy non-splitting bin packing is deliberately NOT the
  * contract — its output depends on iteration order in ways no
  * cross-engine oracle can pin down, while offset packing is exact
  * window algebra in any engine.
  */
object Packing {

  /** @param nTokens per-doc token count column (engine and oracle must
    *                use the same tokenizer)
    * @param nShards independent token streams (≈ loader worker count)
    * @param seqLen  fixed training sequence length in tokens
    * @return doc_id, n_tokens, shard, offset_toks, pack_seq
    */
  def packOffsets(docs: DataFrame, id: Column, nTokens: Column,
      nShards: Int, seqLen: Int): DataFrame = {
    val h = Dedup.md5Hash60(id.cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"),
        Sampling.shard(id.cast("string"), nShards).as("shard"), h.as("h"))
      .withColumn("offset_toks",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_seq", (col("offset_toks") / seqLen).cast("long"))
      .drop("h")
  }

  /** Sliding-window token chunking — the long-document preparation
    * stage for context-bounded training/embedding: each document emits
    * overlapping `chunkLen`-token windows every `stride` tokens
    * (overlap = chunkLen − stride preserves cross-boundary context,
    * the standard RAG/embedding chunking discipline).
    *
    * Chunk count is exact integer math (1 + ⌈(n − chunkLen)/stride⌉
    * for n > chunkLen, else 1), the windows come from a per-row
    * `sequence` + `posexplode` + `slice` chain — pure map-side
    * row explosion riding the scan: no shuffle, no join, output
    * bounded by total tokens / stride. At 100 TB this is the shape
    * that matters: chunking must not cost more than reading.
    *
    * @return doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text
    */
  def chunkTokens(docs: DataFrame, id: Column, toks: Column,
      chunkLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkLen >= stride, "need 0 < stride <= chunkLen")
    docs.select(id.as("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n") <= chunkLen, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(n - $chunkLen + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"),
        col("col").as("chunk_idx"),
        (col("col") * stride).as("start_tok"),
        slice(col("toks"), (col("col") * stride + 1).cast("int"), lit(chunkLen))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
