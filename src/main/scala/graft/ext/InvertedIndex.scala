package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** Inverted index construction — term → (document frequency, bounded
  * posting list). The retrieval-side complement of the corpus ops:
  * dedup finds near-identical documents, contamination checks eval
  * overlap, and the inverted index answers "which documents contain
  * this term" for corpus forensics (boilerplate hunts, contamination
  * drill-down, targeted resampling).
  *
  * Scale discipline — the naive `collect_list(doc_id)` per term is the
  * classic 100 TB trap: a stopword's posting list is the whole corpus,
  * so one group swallows billions of ids in a single aggregation
  * buffer. This implementation keeps every stage bounded:
  *
  *   1. explode → distinct (term, doc_id): one exchange, dedups
  *      per-document repeats map-side via the partial aggregate.
  *   2. df counts: partial+final count over the distinct frame — the
  *      full document frequency, computed WITHOUT materializing lists.
  *   3. posting sample: [[TopKPerKey]] bounded per-term heaps keep only
  *      the k smallest doc_ids — ≤ k rows per term per partition cross
  *      the exchange, so the hottest term costs the same as the rarest.
  *   4. counts ⋈ postings on term (both sides already term-keyed and
  *      term-count-sized).
  *
  * The posting list is therefore a deterministic SAMPLE (first k by
  * doc_id) with the true df alongside — the contract a lake-scale index
  * can actually honor; full lists for selected terms are a filtered
  * re-run, not a default.
  */
object InvertedIndex {

  /** @param docs     corpus frame
    * @param docId    document id column
    * @param text     text column (lowercased, whitespace-tokenized)
    * @param k        posting-list cap per term
    * @param minDf    drop terms appearing in fewer documents (noise floor)
    * @return term, n_docs (exact df), postings_csv (first k doc_ids,
    *         ascending, comma-joined)
    */
  def build(docs: DataFrame, docId: Column, text: Column, k: Int, minDf: Long): DataFrame = {
    val termDoc = docs
      .select(docId.as("doc_id"), explode(TextOps.tokens(lower(text))).as("term"))
      .distinct()
    val counts = termDoc.groupBy(col("term")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDf)
    val capped = TopKPerKey.perKey(termDoc.select(col("term"), col("doc_id")),
      keys = Seq(col("term")), order = Seq(col("doc_id")), k = k)
    val postings = capped.groupBy(col("term"))
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings_csv"))
    counts.join(postings, Seq("term"))
  }
}
