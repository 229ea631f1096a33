package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch as a mergeable typed Aggregator — point-frequency
  * estimates over a universe too large to count exactly (Cormode &
  * Muthukrishnan, J. Algorithms 2005). Completes the sketch family:
  * HLL ≈ distinct, Misra–Gries ≈ top-k, Bloom ≈ membership, CMS ≈
  * "how often did THIS key occur".
  *
  * d rows × w counters; each input increments one counter per row at
  * the Kirsch–Mitzenmacher positions [[Bloom.positions]] derives from
  * the oracle-portable 60-bit md5 hash (same arithmetic, m=w, k=d).
  * Estimate = min over the d counters — never an undercount; expected
  * overcount ≈ N/w per non-colliding mass, ε = e/w with probability
  * 1 − e^(−d) in the classic analysis (spec-bounded, CountMinSpec).
  *
  * Unlike MG (admission order) and HLL (register layout), CMS cells
  * are PURE SUMS — the finished sketch is partition-layout-invariant,
  * so the estimates are exactly reproducible relationally and the
  * query gate is a full DuckDB hash oracle, not rows-only: the first
  * exactly-oracled sketch in the registry.
  *
  * 100 TB shape: partial aggregation folds each partition into one
  * d×w array map-side; only sketches (d·w longs — 64 KiB at the
  * 4×2048 default) cross the exchange, and the finished sketch
  * broadcasts for map-side probes. At corpus scale you keep ONLY the
  * sketch; any exact side is harness/demonstration.
  */
object CountMin {

  /** Default depth (hash rows). */
  val DefaultD: Int = 4

  /** Default width (counters per row). */
  val DefaultW: Int = 2048

  /** Mergeable d×w counter aggregator over 60-bit hash inputs;
    * buffer layout is row-major `cell(i, p) = i*w + p`. */
  class CmsAgg(w: Int = DefaultW, d: Int = DefaultD)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(w > 0 && d >= 1, s"need w > 0, d >= 1; got w=$w d=$d")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val ps = Bloom.positions(h, w, d)
      var i = 0
      while (i < d) { b(i * w + ps(i)) += 1L; i += 1 }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Aggregate column building the sketch from a LONG hash column. */
  def agg(w: Int = DefaultW, d: Int = DefaultD): Column => Column =
    udaf(new CmsAgg(w, d), Encoders.scalaLong).apply(_)

  /** Point-frequency estimate against a packed sketch column: min of
    * the d counters at `h`'s positions — d array reads + least(),
    * all codegen'd built-ins. */
  def estimate(cells: Column, h: Column, w: Int = DefaultW,
      d: Int = DefaultD): Column =
    least(Bloom.bitPositions(h, w, d).zipWithIndex.map { case (p, i) =>
      element_at(cells, (lit(i * w) + p).cast("int") + 1)
    }: _*)
}
