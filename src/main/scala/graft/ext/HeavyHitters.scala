package graft.ext

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a mergeable typed Aggregator —
  * the bounded-memory answer to "which tokens dominate this corpus"
  * when the exact formulation (vocab_topk's explode → full count →
  * top-k) must shuffle one row per DISTINCT token, and the token
  * universe itself is the problem (URLs, hashes, typos make it
  * corpus-sized at 100 TB).
  *
  * Sketch state is ≤ k−1 counters regardless of input size (Misra &
  * Gries, "Finding repeated elements", Sci. Comput. Program. 1982; the
  * merge step follows Agarwal et al., "Mergeable Summaries", PODS
  * 2012): reduce increments a tracked counter, admits the item if a
  * slot is free, else decrements all counters; merge sums counters and
  * re-prunes to the top k−1 by subtracting the k-th largest count.
  *
  * Guarantees (spec-gated, HeavyHittersSpec):
  *  - every item with true frequency > n/k is in the output;
  *  - estimates are lower bounds: true − n/k ≤ est ≤ true.
  * The exact counts depend on partition layout (like any mergeable
  * sketch, and like approx_count_distinct's HLL), so this registers as
  * a rows-only query, not a DuckDB-oracled one; vocab_topk is the exact
  * baseline it approximates.
  *
  * 100 TB shape: partial aggregation folds each partition into ≤ k−1
  * counters map-side; only sketches (k counters each) cross the
  * exchange. Driver/output size is O(k).
  */
object HeavyHitters {

  /** @param k counter budget: tracks ≤ k−1 items; error bound n/k. */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k - 1 => b.updated(item, 1L)
        case None =>
          // decrement-all: drop zeroed counters (classic MG step).
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    /** Mergeable-summaries combine: sum counts, then subtract the k-th
      * largest combined count from every counter and keep positives —
      * the union can hold up to 2(k−1) counters and must shrink back
      * to k−1 while preserving the MG error bound. */
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k - 1) combined
      else {
        val kth = combined.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        combined.view.mapValues(_ - kth).filter(_._2 > 0).toMap
      }
    }

    /** Deterministic presentation: count desc, then token asc. */
    override def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def misraGries(k: Int): TypedColumn[String, Seq[(String, Long)]] =
    new MisraGries(k).toColumn
}
