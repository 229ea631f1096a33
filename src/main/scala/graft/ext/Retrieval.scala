package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combining a lexical ranking (BM25/tf-idf)
  * with a dense ranking (embedding distance) is the production RAG
  * retrieval shape — each path finds documents the other misses.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * fused(d) = Σ over paths of 1/(c + rank_p(d)) with c = 60, which
  * needs no score calibration between paths — only ranks. Made
  * exact-integer (the tfidf_topk discipline): each contribution is
  * floor(1e12 / (c + rank)) — one BIGINT integral division per
  * (path, candidate), identical in any engine — so fused scores
  * compare and tie-break (by doc_id) deterministically.
  *
  * 100 TB shape: inputs are the PER-QUERY TOP-K frames of each path
  * (queries × k rows each, never corpus-sized); fusion is one
  * union + hash agg on (query, doc) and a bounded TopKPerKey heap.
  * The expensive part of hybrid retrieval is the per-path candidate
  * generation, which stays in the paths' own scale envelopes
  * (inverted-index / ANN-bucket scans) — fusion itself is
  * output-sized.
  */
object Retrieval {

  /** Fixed-point scale for the reciprocal-rank contributions. */
  val RrfScale = 1000000000000L

  /** Fuse per-query rankings. Each input frame carries
    * (query_id, doc_id, rank) with rank 1-based; a document absent
    * from a path simply contributes nothing for it. Output: the
    * fused per-query top-k as (query_id, doc_id, rrf_x1e12, n_paths).
    */
  def rrfFuse(paths: Seq[DataFrame], k: Int, c: Long = 60L): DataFrame = {
    val contribs = paths.map(_.select(col("query_id"), col("doc_id"),
      expr(s"$RrfScale div ($c + rank)").as("contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_x1e12"),
        count(lit(1)).as("n_paths"))
    graft.plans.TopKPerKey.perKey(fused,
      keys = Seq(col("query_id")),
      order = Seq(col("rrf_x1e12").desc, col("doc_id")), k = k)
  }
}
