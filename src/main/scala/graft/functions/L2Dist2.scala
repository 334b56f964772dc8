package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance of two numeric array columns as a native Catalyst
  * expression — the PREFILTER metric of quantizer assignment (sized IVF
  * cells, `SimilarityPack.semCells`). One codegen'd pass per row, double
  * accumulation, no explode, no shuffle — the same hot-path role
  * [[CosineSim]] plays for the ANN scans.
  *
  * NOT the decider: double sums are order-fixed here (sequential index
  * order) but the DuckDB twin's SUM carries no order guarantee, so
  * cross-engine agreement at the last bit cannot be assumed. Callers use
  * this inside a MARGIN (keep every candidate within `min + margin`) and
  * let the exact order-independent decimal distance pick the winner on
  * the survivors — the same prefilter + exact-verify discipline as the
  * cosine near-dup family. Returns null if either side is null or the
  * lengths differ; float and double element types are accepted.
  */
case class L2Dist2(left: Expression, right: Expression)
    extends BinaryExpression with NumericArrayPair {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (lt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Dist2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_dist2"
}
