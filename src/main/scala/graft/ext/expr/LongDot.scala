package graft.ext.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd exact integer kernels over two `array<long>`
  * columns: dot product and squared euclidean distance.
  *
  * Same escalation rationale as [[CosineSim]] (SURVEY §4.3 tier b): the
  * built-in `aggregate(zip_with(a, b, ...))` form is a higher-order
  * function — interpreted (CodegenFallback), with a 64-element
  * intermediate array ALLOCATED PER ROW by zip_with. In semdedup's
  * within-cluster self-join the kernel runs once per candidate PAIR
  * (quadratic in cluster size), so the interpreted HOF is the whole
  * stage cost. The fused loop is allocation-free inside whole-stage
  * codegen. Semantics identical to the HOF form for the equal-length
  * quantized vectors every caller passes: left-to-right Long
  * accumulation, Java wrap-around overflow (callers quantize to
  * milli-units, so 64-dim unit-norm products peak ~1e6 — 12 orders of
  * magnitude below wrap). Sole divergence: mismatched lengths truncate
  * to the shorter side, where zip_with would null-pad and the fold
  * would return NULL (spec-pinned in VectorOpsSpec).
  */
case class LongDot(left: Expression, right: Expression, squaredDist: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<long>, array<long>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = if (squaredDist) "long_dist2" else "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      val yi = y.getLong(i)
      if (squaredDist) { val d = xi - yi; acc += d * d } else acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val term =
        if (squaredDist) s"($xi - $yi) * ($xi - $yi)" else s"$xi * $yi"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $a.getLong($i);
         |  long $yi = $b.getLong($i);
         |  $acc += $term;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Exact integer dot product (Column API). */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b),
        squaredDist = false))

  /** Exact integer squared euclidean distance (Column API). */
  def longDist2(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b),
        squaredDist = true))
}
