package graft.ext.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Nearest-centroid id (argmin of squared L2 distance) for IVF coarse
  * assignment: given a literal centroid table `(cids(i), cents(i))`,
  * maps an `array<float>` vector to the cid of its closest centroid,
  * breaking exact-distance ties on the smaller cid — i.e. min over
  * lexicographic `(distance, cid)`, the same ordering the DuckDB
  * oracle's `row_number() OVER (ORDER BY d, cid)` uses.
  *
  * Why a custom Expression (SURVEY §4.3 tier b): the built-in form is
  * `array_min(array(struct(aggregate(zip_with(...)), cid), ...))` — one
  * interpreted higher-order chain PER CENTROID per row, allocating
  * zipped arrays and dispatching a lambda per element. The assignment
  * kernel is nCentroids × dim multiply-adds and IS the IVF build cost
  * at 100 TB, so it earns a fused codegen loop over plain Java arrays.
  * Distance math is identical: left-to-right double accumulation of
  * `(float→double − double)²`.
  */
case class NearestCentroid(child: Expression,
    cents: Seq[Seq[Double]], cids: Seq[Long])
    extends UnaryExpression {
  require(cents.nonEmpty && cents.length == cids.length,
    "one cid per centroid, at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "nearest_centroid"

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Long] = cids.toArray

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var bestD = Double.PositiveInfinity
    var bestC = Long.MaxValue
    var c = 0
    while (c < centArr.length) {
      val cv = centArr(c)
      val n = math.min(x.numElements(), cv.length)
      var s = 0.0
      var j = 0
      while (j < n) {
        val d = x.getFloat(j).toDouble - cv(j); s += d * d; j += 1
      }
      if (s < bestD || (s == bestD && cidArr(c) < bestC)) {
        bestD = s; bestC = cidArr(c)
      }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
      val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val cv = ctx.freshName("cv")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      s"""
         |double $bestD = Double.POSITIVE_INFINITY;
         |long $bestC = Long.MAX_VALUE;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $d = (double) $v.getFloat($j) - $cv[$j];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD || ($s == $bestD && $cidsRef[$c] < $bestC)) {
         |    $bestD = $s; $bestC = $cidsRef[$c];
         |  }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-API entry point. */
  def nearestCentroid(v: Column, cents: Seq[Seq[Double]], cids: Seq[Long]): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(v), cents, cids))
}
