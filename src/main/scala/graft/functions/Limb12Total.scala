package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exact double from two whole-group LONG limb sums of scale-12 grid
  * integers: the unscaled total U = Σhi·2³¹ + Σlo is rebuilt in BigInteger
  * (it can exceed a long — that is the reason the limbs exist), wrapped as
  * the scale-12 java BigDecimal, and converted with `doubleValue` — the
  * EXACT value path `cast(sum(decimal(...,12)) AS double)` takes
  * (Spark's Decimal.toDouble is BigDecimal.doubleValue), so replacing a
  * per-row decimal sum with long limb sums + this one-per-group finisher
  * is bit-identical (GridSum12Spec pins it). Evaluated once per GROUP in
  * the final aggregate projection — the BigInteger/BigDecimal work is
  * group-count-proportional, never row-proportional.
  */
case class Limb12Total(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"limb12_total needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "limb12_total"

  override def nullSafeEval(hiSum: Any, loSum: Any): Any =
    Limb12Total.total(hiSum.asInstanceOf[Long], loSum.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l) =>
      s"graft.functions.Limb12Total.total($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Limb12Total =
    copy(left = newLeft, right = newRight)
}

object Limb12Total {
  /** U = hi·2³¹ + lo exactly (BigInteger — U may exceed a long), then the
    * scale-12 BigDecimal's double. Called from generated code.
    */
  def total(hiSum: Long, loSum: Long): Double =
    new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hiSum).shiftLeft(31)
        .add(java.math.BigInteger.valueOf(loSum)),
      12).doubleValue()
}
