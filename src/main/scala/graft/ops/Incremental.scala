package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for algebraic rollups —
  * the batch complement of stream/Pipeline's merge-on-sink partials,
  * and the scale answer to the reference's nightly FULL re-extract
  * (timescale_to_deltalake.py re-reads both tables every run): a daily
  * rollup over an append-only fact stream should fold ONLY the new
  * partition into the standing aggregate, never re-touch history.
  *
  * The view schema is the algebraic core the engine uses everywhere
  * (F4 + exact decimal sum): keys*, n (count), sum_v (DECIMAL —
  * merge-order-independent), min_v, max_v. Averages are derived at
  * read time (sum/n), never stored — a stored average is not
  * mergeable.
  *
  * refresh = union(standing, partial-of-new) → one hash aggregate over
  * (|view| + |new partials|) rows. 100 TB shape: the standing view is
  * keys-cardinality-sized (days × types, not events); the only
  * full-data pass is over the NEW partition. Idempotence note: this is
  * add-merge — re-folding the same partition twice double-counts, so
  * callers pair it with partition-overwrite bookkeeping (io.Sinks
  * dynamic overwrite / cdc sequence numbers), same at-least-once
  * contract as the reference's JDBC sinks (SURVEY §2 J6).
  */
object Incremental {

  /** Fold a batch of raw rows into view-shaped partials.
    * @param scale decimal scale of the exact sum — must put the true
    *   values ON the decimal grid (2 for raw 2-dp measures; 4 for
    *   products of two 2-dp factors, where a 2-dp cast would hit
    *   half-points and the engines' tie rules diverge) */
  def partials(df: DataFrame, keys: Seq[String], value: String,
      scale: Int = 2): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(value).cast(s"decimal(18,$scale)")).as("sum_v"),
        min(col(value)).as("min_v"),
        max(col(value)).as("max_v"))

  /** Merge a standing view with new partials (both view-shaped). */
  def merge(view: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(incoming)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Lazy data-derived history/delta split — the shared idiom under
    * mv_refresh and mv_refresh_join (Retention.retain carries its own
    * filesystem-side variant): `cut` is a 1-row frame with a `cutoff`
    * column (an aggregate of the SAME frame being split — no eager
    * driver action), broadcast-crossed in; rows route by the
    * predicate. If `cut` is empty (empty input) both halves are empty
    * — which is correct, since the frame being split is too. */
  def splitAt(df: DataFrame, cut: DataFrame,
      p: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    df.crossJoin(broadcast(cut)).filter(p(col("cutoff"))).drop("cutoff")

  /** The delta terms of an insert-only JOIN view refresh (classic IVM:
    * Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB — with the standing
    * A_old⋈B_old these four quadrants cover (A_old∪ΔA)⋈(B_old∪ΔB)
    * disjointly and exactly, so folding their partials into the view
    * is indistinguishable from a full re-join).
    *
    * Cost shape at 100 TB: every term has at least one Δ-sized side —
    * ΔA⋈B_old shuffles only ΔA against the dim, A_old⋈ΔB broadcasts
    * the tiny ΔB so history pays one pruned SCAN but an O(Δ) shuffle,
    * ΔA⋈ΔB is negligible. The history⋈history quadrant — the cost the
    * reference's nightly full re-extract pays every run — is never
    * recomputed. */
  def deltaJoinTerms(
      aOld: DataFrame, aNew: DataFrame, bOld: DataFrame, bNew: DataFrame,
      join: (DataFrame, DataFrame) => DataFrame): Seq[DataFrame] =
    Seq(join(aNew, bOld), join(aOld, bNew), join(aNew, bNew))
}
