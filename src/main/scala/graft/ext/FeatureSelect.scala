package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mutual-information feature selection (Manning, Raghavan & Schütze,
  * "Introduction to Information Retrieval" ch. 13.5): rank terms by
  * I(term-presence; label) from a document-level presence frame — the
  * audit step between cheap rule labels and a trained quality filter
  * (which terms actually carry the label signal, and which merely ride
  * document frequency).
  *
  * Exact-integer discipline (SparkEntry conventions): the 2×2
  * presence/label contingency cells are exact counts; each cell's
  * ln(N·N_ij/(N_i·N_j)) floors to a 1e6-scaled BIGINT from
  * exact-integer-valued ratios (arguments stay double-exact far past
  * this corpus), weighted by the exact N_ij and summed as BIGINTs.
  * Zero cells contribute 0 (the x·ln x → 0 limit). mi_num can sit a
  * few 1e-6 below 0 on near-independent terms (floor jitter), so the
  * per-doc-scale mi_x1e6 clamps at 0 to keep HALF_UP on non-negative
  * operands; the signed mi_num ships alongside.
  *
  * 100 TB shape: one (term) aggregate over the presence frame, a
  * TakeOrdered vocab cut, then everything rides the vocabK-term frame
  * with the 1-row totals broadcast.
  */
object FeatureSelect {

  /** Inputs: `labeled` with one row per (doc_id, keep-label) — the
    * full population, including tokenless docs — and `pres` with one
    * row per (doc_id, keep-label, present term) (presence, not counts:
    * dedupe upstream). Output: top `topK` of the `vocabK`-by-df
    * vocabulary ranked by MI:
    * (term, n11, n10, n01, n00, mi_num, mi_x1e6). */
  def mutualInfo(labeled: DataFrame, pres: DataFrame, vocabK: Int,
      topK: Int): DataFrame = {
    val totals = labeled.agg(count(lit(1)).as("n"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("npos"))
    val tc = pres
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n11"))
      .orderBy(col("df").desc, col("term")).limit(vocabK)
    def mln(nij: Column, ni: Column, nj: Column): Column =
      when(nij > 0L, nij *
        floor(log((col("n") * nij).cast("double") / (ni * nj).cast("double"))
          * 1e6 + 0.5).cast("long")).otherwise(0L)
    tc.crossJoin(broadcast(totals))
      .withColumn("n10", col("df") - col("n11"))
      .withColumn("n01", col("npos") - col("n11"))
      .withColumn("n00", col("n") - col("npos") - col("n10"))
      .withColumn("mi_num",
        mln(col("n11"), col("df"), col("npos")) +
          mln(col("n10"), col("df"), col("n") - col("npos")) +
          mln(col("n01"), col("n") - col("df"), col("npos")) +
          mln(col("n00"), col("n") - col("df"), col("n") - col("npos")))
      .selectExpr("term", "n11", "n10", "n01", "n00", "mi_num",
        "(2 * greatest(mi_num, 0) + n) div (2 * n) AS mi_x1e6")
      .orderBy(col("mi_num").desc, col("term")).limit(topK)
  }
}
