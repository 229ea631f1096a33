package graft.ext.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for content-defined-chunking cut positions (LBFS,
  * Muthitacharoen et al. SOSP 2001; FastCDC, Xia et al. ATC 2016): for
  * a text of `n` characters emits the sorted array of 1-based char
  * positions `p` where a chunk boundary falls — every `p ∈ [w, n]`
  * whose trailing `w`-char window hashes to `0 mod modulus` under the
  * repo's md5Hash60 convention (Dedup.scala:29), plus the terminal
  * `p = n`. Bit-identical to the relational form
  *
  *   explode(sequence(w, len))
  *     .filter(md5Hash60(substr(text, p-w+1, w)) % modulus = 0 OR p = len)
  *     .groupBy(doc).agg(sort_array(collect_set(p)))
  *
  * which remains the DuckDB oracle (and the spec pin — CdcCutsSpec
  * proves kernel ≡ relational on the full cdc corpus).
  *
  * Escalation rationale (the ShingleMd5/MinhashSignature precedent,
  * SURVEY §4.3 tier b): the relational form materializes one row PER
  * CHARACTER of the corpus and shuffles them through a
  * `groupBy(doc) + collect_set` to reassemble each doc's cut list —
  * at 100 TB that is O(total corpus chars) rows through an exchange,
  * the registry's one scale-killer plan (VERDICT r12/r13). This kernel
  * computes the whole cut array in ONE eval per doc: the char windows
  * stream through a thread-cached MessageDigest with zero
  * row-expansion, zero shuffle, and the call inlines into whole-stage
  * codegen. The downstream chunk slicing then rides the same row —
  * the corpus text never crosses an exchange at all.
  *
  * Positions are CHARACTER positions (SQL `substr` semantics): char
  * starts are walked by UTF-8 continuation-byte detection, and each
  * window hashes its underlying UTF-8 BYTES — exactly what
  * `md5(substr(text, p-w+1, w) :: binary)` hashes. Texts shorter than
  * `w` chars yield the single terminal cut `[n]` (whole doc, one
  * chunk); empty texts yield an empty array.
  */
case class CdcCuts(child: Expression, w: Int, modulus: Long)
    extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")
  require(modulus >= 1, s"modulus must be >= 1, got $modulus")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(s: Any): Any =
    CdcCuts.cuts(s.asInstanceOf[UTF8String], w, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ext.expr.CdcCuts.cuts($c, $w, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCuts {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** All cut positions of a text (static so generated code calls
    * straight into compiled bytecode). */
  def cuts(s: UTF8String, w: Int, modulus: Long): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // 1-based char position p covers bytes [offs(p-1), offs(p)) —
    // a char starts at every non-continuation byte (valid UTF-8).
    val offs = new Array[Int](nb + 1)
    var nc = 0
    var i = 0
    while (i < nb) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(nc) = i; nc += 1 }
      i += 1
    }
    offs(nc) = nb
    if (nc == 0) return new GenericArrayData(Array.emptyLongArray)
    if (nc < w) return new GenericArrayData(Array(nc.toLong))
    val md = digests.get()
    val buf = new Array[Long](nc - w + 2)
    var n = 0
    var p = w
    while (p <= nc) {
      val start = offs(p - w)
      md.reset()
      md.update(bytes, start, offs(p) - start)
      val d = md.digest()
      // md5Hash60: first 15 hex chars = first 60 bits — the first 8
      // bytes big-endian with the low nibble of byte 7 dropped.
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      if ((v >>> 4) % modulus == 0L || p == nc) { buf(n) = p.toLong; n += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, n))
  }

  /** Cut positions of a text column (Column API). */
  def cdcCuts(text: Column, w: Int, modulus: Long): Column =
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(text), w, modulus))
}
