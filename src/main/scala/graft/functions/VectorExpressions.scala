package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — builds
  * three CodegenFallback higher-order nodes and evaluates an interpreted
  * lambda per element: at ANN scale (corpus × queries × dim element steps)
  * that interpreter dispatch dominates the query. This expression compiles
  * to a tight primitive loop inside whole-stage codegen instead — no
  * per-element allocation, no virtual dispatch.
  *
  * Summation is sequential left-to-right, exactly like the fold it
  * replaces, so results stay bit-identical to the composable form (and to
  * any engine that folds left-to-right).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = DoubleType

  /** Always nullable: a null INPUT, a null ELEMENT, or a LENGTH MISMATCH
    * each null the result (matching the fold). Schema metadata can rule
    * out the first two but never raggedness, and understating nullability
    * makes codegen constant-fold `isNull` away so the null branch could
    * silently never fire (wrong results, no error).
    */
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  /** Null semantics match the fold exactly: a null ELEMENT in either array
    * poisons the product (zip_with's x*y is null) and therefore the whole
    * sum (aggregate's acc+null) — the result is null, never a silent 0.0
    * contribution. MISMATCHED LENGTHS are null too: zip_with pads the
    * short side with nulls, so the fold yields null — ragged embeddings
    * surface as missing scores, never as silently-truncated ones.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two array<int> columns — the scoring
  * kernel of the QUANTIZED similarity path: int8 codes from
  * [[graft.operators.Similarity.quantizeInt8]] stay integers through the
  * multiply-accumulate (a long sum — 127²·dim is nowhere near overflow),
  * and the single dequantizing division happens once per PAIR, not per
  * component. Same null contract as [[DotProduct]]: null input, null
  * element, or length mismatch → null. Returns long, so the result is
  * EXACT and any integer-capable engine reproduces it — the double path's
  * summation-order caveats don't exist here.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot_int requires two array<int> arguments, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getInt($i) * $b.getInt($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd EXACT integer dot product of two array<int> columns. */
  def vecDotInt(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProductInt(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
