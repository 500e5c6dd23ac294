package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Morton (Z-order) curve key over 2..8 numeric dimensions — the write-side
  * clustering key that makes min/max data skipping effective on SEVERAL
  * filter columns at once (a single-column sort gives perfect skipping on
  * one dimension and none on the others; interleaving quantile-bucket bits
  * gives every dimension locality ∝ 1/2^bits per file).
  *
  * `bounds(d)` holds the sorted interior quantile boundaries of dimension
  * d (2^bits − 1 of them, sampled once per write by [[graft.operators.ZOrder]] —
  * a bounded driver-side array, the same family as an IVF centroid table,
  * NOT a per-row collect). Per row: bucket_d = #boundaries ≤ value (a
  * codegen'd binary search), then bucket bits interleave dimension-major
  * into one long. Null values deterministically take bucket 0 — they
  * cluster together at the curve origin instead of poisoning the key.
  *
  * Everything is inside whole-stage codegen: the write path of a 100-TB
  * table pays one binary search per dimension per row, no interpreted
  * higher-order functions, no UDF boxing.
  */
case class ZValue(children: Seq[Expression], bounds: Array[Array[Double]])
    extends Expression {

  private val nDims = children.length
  private val bitsPerDim =
    if (bounds.isEmpty) 0 else 64 - java.lang.Long.numberOfLeadingZeros(bounds(0).length.toLong)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.exists(_.dataType != DoubleType))
      return TypeCheckResult.TypeCheckFailure(
        s"z_value requires double children, got ${children.map(_.dataType.sql).mkString(", ")}")
    if (nDims < 2 || nDims > 8)
      return TypeCheckResult.TypeCheckFailure(s"z_value takes 2..8 dimensions, got $nDims")
    if (bounds.length != nDims)
      return TypeCheckResult.TypeCheckFailure(
        s"z_value: ${bounds.length} bounds arrays for $nDims dimensions")
    if (bounds.exists(b => b.length != bounds(0).length) ||
        !isPow2Minus1(bounds(0).length) || nDims * bitsPerDim > 63)
      return TypeCheckResult.TypeCheckFailure(
        "z_value: every dimension needs the same 2^bits-1 boundaries with dims*bits <= 63")
    TypeCheckResult.TypeCheckSuccess
  }

  private def isPow2Minus1(n: Int): Boolean = n > 0 && ((n + 1) & n) == 0

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "z_value"

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < nDims) {
      val v = children(d).eval(input)
      val bucket =
        if (v == null) 0
        else ZValue.bucketOf(bounds(d), v.asInstanceOf[Double])
      var b = 0
      while (b < bitsPerDim) {
        if (((bucket >> b) & 1) != 0) z |= 1L << (b * nDims + d)
        b += 1
      }
      d += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("zBounds", bounds, "double[][]")
    val z = ctx.freshName("z")
    val perDim = children.zipWithIndex.map { case (child, d) =>
      val c = child.genCode(ctx)
      val bkt = ctx.freshName("bkt")
      val b = ctx.freshName("b")
      s"""
         |${c.code}
         |int $bkt = ${c.isNull} ? 0
         |  : graft.functions.ZValue.bucketOf($boundsRef[$d], ${c.value});
         |for (int $b = 0; $b < $bitsPerDim; $b++) {
         |  if ((($bkt >> $b) & 1) != 0) $z |= 1L << ($b * $nDims + $d);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
        Seq(s"long $z = 0L;\n$perDim"), Seq.empty),
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(z, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)
}

object ZValue {
  /** #boundaries ≤ v, via binary search — bucket index in [0, 2^bits).
    * Called from generated code; deterministic for duplicate boundaries
    * (same array + same key always walks the same path).
    */
  def bucketOf(bounds: Array[Double], v: Double): Int = {
    val p = java.util.Arrays.binarySearch(bounds, v)
    if (p >= 0) p + 1 else -p - 1
  }
}

object ZFunctions {
  /** Z-order key column over double columns with per-dimension boundaries. */
  def zValue(cols: Seq[Column], bounds: Array[Array[Double]]): Column =
    GraftSqlBridge.column(ZValue(cols.map(GraftSqlBridge.expression), bounds))
}
