package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType}

/** Exact double of an integer-valued decimal reinterpreted at `scale`:
  * the child carries the UNSCALED total U of an exact decimal sum (built
  * by [[graft.operators.GridSum.combine]] from per-partition long limb
  * partials), and the result is `new BigDecimal(U, scale).doubleValue` —
  * the EXACT value path `cast(sum(decimal(p,scale)) AS double)` takes
  * (Spark's Decimal.toDouble is BigDecimal.doubleValue), so replacing a
  * per-row non-compact decimal sum (precision > 18: every row
  * deserializes, adds and reserializes a BigDecimal in the aggregate
  * buffer) with long limb sums + decimal combine + this one-per-group
  * finisher is bit-identical. The scale-generic sibling of
  * [[Limb12Total]] (which fuses the limb recombine for the scale-12
  * grid); here the recombine already happened in decimal, because
  * two-level (per-partition) limb sums land as decimal partials.
  */
case class UnscaledToDouble(child: Expression, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case d: DecimalType if d.scale == 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unscaled_to_double needs a scale-0 decimal (the unscaled total), got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unscaled_to_double"

  override def nullSafeEval(u: Any): Any =
    UnscaledToDouble.total(u.asInstanceOf[org.apache.spark.sql.types.Decimal], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u =>
      s"graft.functions.UnscaledToDouble.total($u, $scale)")

  override protected def withNewChildInternal(newChild: Expression): UnscaledToDouble =
    copy(child = newChild)
}

object UnscaledToDouble {
  /** BigDecimal(U, scale).doubleValue — evaluated once per GROUP in the
    * final aggregate projection. Called from generated code.
    */
  def total(u: org.apache.spark.sql.types.Decimal, scale: Int): Double =
    new java.math.BigDecimal(u.toJavaBigDecimal.unscaledValue(), scale).doubleValue()
}
