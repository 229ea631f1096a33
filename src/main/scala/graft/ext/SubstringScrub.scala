package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicated-span REMOVAL — the corpus rewrite Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better")
  * actually deploy, as opposed to [[graft.queries.ExtQueries]]'
  * `substring_dedup` which only SCORES repeated windows: every w-token
  * window that recurs corpus-wide keeps its FIRST occurrence (min
  * (doc_id, position) — deterministic, so the rewrite hash-oracles
  * across engines) and every later occurrence's tokens are excised;
  * overlapping excisions merge (gaps-and-islands, the Sessionize
  * convention) and the surviving tokens re-join into the scrubbed
  * text.
  *
  * The rewrite operates on the NORMALIZED token stream (lowercased,
  * whitespace-split — the same normalization the window hashes use),
  * so positions in the hash frame and the reconstruction frame always
  * align.
  *
  * 100 TB shape: windows are (doc_id, pos, 60-bit hash) rows — ~one
  * per token, nothing wider shuffles; the first-occurrence rule is ONE
  * partial+final min-struct aggregate per hash, and the removal join
  * shares its hash partitioning. The islands window rides only the
  * REMOVED occurrences (the duplicated fraction of the corpus, not the
  * corpus), and the span list collected back onto each doc row is
  * bounded by the doc's own window count — per-doc state never exceeds
  * the doc row itself. The final keep filter is a map-side
  * higher-order filter over (tokens × spans); spans per doc is small
  * in practice (merged islands), and the whole pass is linear in
  * corpus tokens otherwise.
  */
object SubstringScrub {

  /** Rewrite `docs`, excising every non-first occurrence of each
    * duplicated w-token window. Output: (doc_id, n_tokens, n_removed,
    * scrubbed_text) — n_tokens counts the normalized input tokens,
    * n_removed how many were excised.
    */
  def scrub(docs: DataFrame, id: Column, text: Column, w: Int = 8): DataFrame = {
    // Two consumers (window hashing, reconstruction) — materialize the
    // normalized token frame once.
    val base = docs.select(id.as("doc_id"),
        TextOps.tokens(lower(text)).as("toks"))
      .localCheckpoint(true)
    // Window i (1-based start) covers tokens [i, i+w-1]; hashes are the
    // ShingleMd5 codegen kernel — identical bits to md5Hash60 of the
    // space-joined window (spec-pinned), one JVM call per doc.
    val wins = base.select(col("doc_id"),
        posexplode(graft.ext.expr.ShingleMd5.shingleMd5(col("toks"), w)))
      .select(col("doc_id"), (col("pos") + 1).as("s"), col("col").as("h"))
    // Keep rule: the lexicographic min (doc_id, s) per hash survives.
    // A unique window is trivially its own min, so no count is needed.
    val first = wins.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("s"))).as("m"))
    val removed = wins.join(first, "h")
      .filter(!(col("doc_id") === col("m.doc_id") && col("s") === col("m.s")))
      .select(col("doc_id"), col("s"), (col("s") + lit(w - 1)).as("e"))
    // Gaps-and-islands: merge overlapping/adjacent removed spans.
    val ord = Window.partitionBy("doc_id").orderBy("s")
    val prevMax = max(col("e"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val islands = removed
      .withColumn("newi",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("newi"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val spans = islands.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("spans"),
          array().cast("array<struct<s:long,e:long>>")).as("spans"))
      .withColumn("kept", filter(col("toks"),
        (t, i) => !exists(col("spans"),
          sp => sp("s") <= i + 1 && i + 1 <= sp("e"))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("scrubbed_text"))
  }
}
