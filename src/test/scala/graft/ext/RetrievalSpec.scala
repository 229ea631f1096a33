package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand cases for exact-integer reciprocal-rank fusion (the corpus-
  * scale behavior of `hybrid_rrf` is gated by its pinned-cell oracle
  * plus the plant construction documented at the query).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def s(r: Long): Long = Retrieval.RrfScale / (60L + r)

  test("rrfFuse: exact fused order, scores, and path counts on a hand case") {
    // lex: A=1, B=2, C=3; dense: B=1, D=2.
    // B = S(2)+S(1) top; A = S(1) beats D = S(2); C = S(3) last.
    val lex = Seq((0L, "A", 1L), (0L, "B", 2L), (0L, "C", 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, "B", 1L), (0L, "D", 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, dense), k = 10)
      .orderBy(col("rrf_x1e12").desc, col("doc_id"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("B", s(2) + s(1), 2L),
      ("A", s(1), 1L),
      ("D", s(2), 1L),
      ("C", s(3), 1L)))
  }

  test("rrfFuse: k bounds each query independently; doc_id breaks score ties") {
    // Two queries; q1 has a two-way tie at S(1) between docs X and Y
    // (each rank 1 on a different path) — doc_id ascending wins.
    val p1 = Seq((1L, "Y", 1L), (2L, "M", 1L), (2L, "N", 2L))
      .toDF("query_id", "doc_id", "rank")
    val p2 = Seq((1L, "X", 1L), (2L, "M", 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(p1, p2), k = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) == (("X", s(1))), "tie at S(1) broken by doc_id")
    assert(out(2L) == (("M", s(1) + s(2))), "two-path doc wins q2")
    assert(out.size == 2, "exactly one row per query at k = 1")
  }
}
