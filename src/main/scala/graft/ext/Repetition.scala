package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document repetition signals (SURVEY §7.5 extension) — the
  * Gopher/MassiveText-style quality rules that catch boilerplate,
  * keyword stuffing and generator loops: token diversity, the mass of
  * the single most frequent token, and the duplicate-bigram fraction.
  * Documents failing these filters are the classic low-quality tail a
  * training pipeline drops before dedup even runs.
  *
  * Shape (100 TB): the array-level stats (token/bigram counts and their
  * distinct counts) are per-row collection expressions computed ON the
  * scan — no shuffle, no cross-row state. Only the top-token count
  * needs cross-row grouping: one explode → (doc, token) count →
  * per-doc max, each a partial+final HashAggregate with map-side
  * combine. The final join keys both sides on doc_id with per-doc-row
  * cardinality — slim rows, never the corpus text.
  */
object Repetition {

  /** @return doc_id, n_tokens, n_distinct, distinct_ratio, top_cnt,
    *         top_token_frac, n_bigrams, dup_bigram_frac (4-dp ratios;
    *         zero-token docs yield no row — same as the tokenizer
    *         contract everywhere else)
    */
  def stats(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val base = Dedup.rebalance(docs)
      .select(id.as("doc_id"), TextOps.tokens(lower(text)).as("toks"))
      .select(col("doc_id"), col("toks"),
        TextOps.shingles(col("toks"), 2).as("bi"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        size(col("bi")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bi"))).cast("long").as("n_distinct_bigrams"),
        explode(col("toks")).as("t"))
    // One pass: the exploded token rows CARRY the per-doc array stats
    // (constant within a doc), so a single aggregation tree computes the
    // per-(doc,token) counts and then folds stats + top-count per doc —
    // the text column is scanned exactly once.
    val perTok = base.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("c"),
        first(col("n_tokens")).as("n_tokens"),
        first(col("n_distinct")).as("n_distinct"),
        first(col("n_bigrams")).as("n_bigrams"),
        first(col("n_distinct_bigrams")).as("n_distinct_bigrams"))
    perTok.groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("n_distinct")).as("n_distinct"),
        max(col("c")).as("top_cnt"),
        first(col("n_bigrams")).as("n_bigrams"),
        first(col("n_distinct_bigrams")).as("n_distinct_bigrams"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("distinct_ratio"),
        col("top_cnt"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 4)
          .as("top_token_frac"),
        col("n_bigrams"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(round((col("n_bigrams") - col("n_distinct_bigrams"))
            .cast("double") / col("n_bigrams"), 4)).as("dup_bigram_frac"))
  }
}
