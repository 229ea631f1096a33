package graft.ext.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native kernel for per-window 60-bit md5 fingerprints over a token
  * array: for every `w`-token sliding window emits the same value as
  * `conv(substring(md5("t1 t2 … tw"), 1, 15), 16, 10)` — the repo's
  * md5Hash60 convention (Dedup.scala:29), bit-identical to the DuckDB
  * oracle's `CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)`.
  *
  * Same escalation rationale as [[LongDot]] (SURVEY §4.3 tier b): the
  * composable form `transform(sequence(...), i -> md5Hash60(
  * concat_ws(' ', element_at...)))` is a higher-order-function tree —
  * interpreted per WINDOW, with the window string materialized per
  * element. substring_dedup runs it once per corpus token, where it
  * was the whole stage cost (SCALE.md round-8 probe: ~9 s of the 10×
  * run). Here each row is ONE JVM call that streams token bytes
  * through a thread-cached MessageDigest — no window strings, no
  * interpreter — and the call inlines into whole-stage codegen.
  *
  * Tokens must be non-null (guaranteed by TextOps.tokens, which
  * filters empties); arrays shorter than `w` yield an empty result,
  * matching `shingles`' empty-array branch so explode drops the row
  * identically.
  */
case class ShingleMd5(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_md5"

  override def nullSafeEval(a: Any): Any =
    ShingleMd5.hashWindows(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ext.expr.ShingleMd5.hashWindows($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleMd5 {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val Space = Array[Byte](' ')

  /** All `w`-window 60-bit md5 hashes of a token array (static so the
    * generated code calls straight into compiled bytecode). */
  def hashWindows(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    // Token bytes fetched once each, reused across the w windows that
    // contain them.
    val bytes = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) { bytes(j) = toks.getUTF8String(j).getBytes; j += 1 }
    val md = digests.get()
    val out = new Array[Long](n - w + 1)
    var i = 0
    while (i <= n - w) {
      md.reset()
      var k = i
      while (k < i + w) {
        if (k > i) md.update(Space)
        md.update(bytes(k))
        k += 1
      }
      val d = md.digest()
      // First 15 hex chars of the digest = first 60 bits: the first 8
      // bytes big-endian with the low nibble of byte 7 dropped.
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-window md5Hash60 fingerprints (Column API). */
  def shingleMd5(toks: Column, w: Int): Column =
    ColumnBridge.column(ShingleMd5(ColumnBridge.expression(toks), w))
}
