package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared input-type contract of the float-vector expressions
  * ([[CosineSim]], [[L2Dist2]]): both children must be
  * `array<float>` or `array<double>`. Both expressions are
  * SQL-registered, so arbitrary user types can reach them — without
  * this check a non-array argument died with a raw ClassCastException
  * at planning, and an `array<int>` argument was silently MISREAD
  * (`getDouble` over 4-byte int element storage returns garbage)
  * instead of being rejected. */
trait NumericArrayPair { self: BinaryExpression =>

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> or array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
}
