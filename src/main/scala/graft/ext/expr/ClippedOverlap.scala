package graft.ext.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the clipped n-gram overlap that underlies the
  * eval-metric family (BLEU / ROUGE / chrF): for every order
  * n = 1..maxN, the exact multiset statistics
  *
  *   m_n = Σ_g min(count_ref(g), count_cand(g))   (clipped matches)
  *   r_n = |ref n-grams|  = max(0, len_ref  − n + 1)
  *   c_n = |cand n-grams| = max(0, len_cand − n + 1)
  *
  * returned as one array<long> [m_1, r_1, c_1, m_2, r_2, c_2, ...].
  *
  * Two input modes, selected by the children's type:
  *  - (array<string>, array<string>): TOKEN n-grams — gram identity is
  *    the space-joined window, the exact string `concat_ws(' ', ...)`
  *    builds (TextOps.tokens yields space-free tokens, so the join is
  *    injective; counting joined strings ≡ counting windows either
  *    way, which is what the relational form counted).
  *  - (string, string): CHARACTER n-grams — gram identity is the
  *    code-point window, matching `substr(t, i, n)` semantics
  *    (UTF8String substr counts code points, not UTF-16 units).
  *
  * Same escalation rationale as [[ShingleMd5]] (SURVEY §4.3 tier b),
  * but the target here is the SHUFFLE, not an interpreted HOF: the
  * relational formulation exploded every (doc, n, gram) row through a
  * gram-keyed count exchange plus a gram-keyed clipped join — 3–4
  * full-corpus-gram shuffles per side — even though reference and
  * candidate always live on the SAME row (the candidate is a token
  * slice of the reference). One kernel call per row computes all
  * orders map-side; the eval-metric queries then reduce per-doc rows
  * with zero gram-keyed exchanges (guide §2.3/§2.4: don't shuffle what
  * a row can decide locally). Counting is exact-integer HashMap
  * arithmetic — bit-identical to the groupBy/join form, which the
  * unchanged DuckDB oracles re-prove at every SF.
  */
case class ClippedOverlap(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {
  require(maxN >= 1, s"maxN must be >= 1, got $maxN")

  private def isTokenMode: Boolean = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, array<string>) or " +
          s"(string, string), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "clipped_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isTokenMode)
      ClippedOverlap.overlapTokens(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxN)
    else
      ClippedOverlap.overlapChars(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isTokenMode) "overlapTokens" else "overlapChars"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.ext.expr.ClippedOverlap.$fn($a, $b, $maxN)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ClippedOverlap {

  /** Count every n-gram of `grams` into `counts` (ref side), then
    * probe with the cand side decrementing — the standard clipped-
    * match fold. Gram strings are built exactly as the relational
    * form built them, so multiset identity is byte-equal. */
  private def fold(ref: Array[String], cand: Array[String], maxN: Int,
      join: Boolean): Array[Long] = {
    val out = new Array[Long](3 * maxN)
    val counts = new java.util.HashMap[String, Array[Int]]()
    val sb = new java.lang.StringBuilder()
    def gram(src: Array[String], i: Int, n: Int): String =
      if (n == 1) src(i)
      else {
        sb.setLength(0)
        var k = i
        while (k < i + n) {
          if (k > i && join) sb.append(' ')
          sb.append(src(k))
          k += 1
        }
        sb.toString
      }
    var n = 1
    while (n <= maxN) {
      val r = math.max(0, ref.length - n + 1)
      val c = math.max(0, cand.length - n + 1)
      counts.clear()
      var i = 0
      while (i < r) {
        val g = gram(ref, i, n)
        val cell = counts.get(g)
        if (cell == null) counts.put(g, Array(1)) else cell(0) += 1
        i += 1
      }
      var m = 0L
      i = 0
      while (i < c) {
        val cell = counts.get(gram(cand, i, n))
        if (cell != null && cell(0) > 0) { cell(0) -= 1; m += 1 }
        i += 1
      }
      out(3 * (n - 1)) = m
      out(3 * (n - 1) + 1) = r
      out(3 * (n - 1) + 2) = c
      n += 1
    }
    out
  }

  /** Token-mode overlap (static so generated code calls straight into
    * compiled bytecode). */
  def overlapTokens(ref: ArrayData, cand: ArrayData, maxN: Int): ArrayData = {
    def strs(a: ArrayData): Array[String] = {
      val n = a.numElements()
      val out = new Array[String](n)
      var i = 0
      while (i < n) {
        // null elements normalize to "" — the declared input type
        // admits containsNull=true even though current call sites
        // (TextOps.tokens/slice) never produce one (ADVICE r20).
        val u = a.getUTF8String(i)
        out(i) = if (u == null) "" else u.toString
        i += 1
      }
      out
    }
    new GenericArrayData(fold(strs(ref), strs(cand), maxN, join = true))
  }

  /** Char-mode overlap: code-point windows (substr semantics). */
  def overlapChars(ref: UTF8String, cand: UTF8String, maxN: Int): ArrayData = {
    def cps(s: UTF8String): Array[String] = {
      val str = s.toString
      val n = str.codePointCount(0, str.length)
      val out = new Array[String](n)
      var i = 0; var off = 0
      while (i < n) {
        val next = str.offsetByCodePoints(off, 1)
        out(i) = str.substring(off, next)
        off = next
        i += 1
      }
      out
    }
    new GenericArrayData(fold(cps(ref), cps(cand), maxN, join = false))
  }

  /** Clipped n-gram overlap statistics (Column API): array<long>
    * [m_1, r_1, c_1, ..., m_maxN, r_maxN, c_maxN]. */
  def of(ref: Column, cand: Column, maxN: Int): Column =
    ColumnBridge.column(ClippedOverlap(
      ColumnBridge.expression(ref), ColumnBridge.expression(cand), maxN))
}
