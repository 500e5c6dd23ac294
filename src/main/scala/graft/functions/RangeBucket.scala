package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `#{bounds(i) < value}` — the lower-bound index of `value` in a SORTED,
  * bounded, driver-collected boundary array, as a codegen'd binary search.
  *
  * This is the deterministic replacement for `spark_partition_id()` after
  * `repartitionByRange`: the physical partition id depends on the range
  * exchange's RANDOM SAMPLE (`RangePartitioner` seeds from the RDD id), so
  * any recomputation — executor loss, cache eviction, a second action on a
  * derived plan — can silently reassign rows near boundaries. Searching an
  * immutable boundary array collected ONCE makes the bucket a pure function
  * of the data: every re-execution, on any cluster, assigns identically
  * ([[graft.operators.Packing.globalCumsum]] is the consumer).
  *
  * `bounds` holds CATALYST-internal values (pre-converted by the caller) of
  * `elemType`, sorted ascending by that type's natural ordering, no nulls —
  * a bounded driver-side array (one element per range, the ZValue-boundary
  * family, NOT data). Null input deterministically takes bucket 0, matching
  * a range exchange's nulls-first placement. Comparison is the type's
  * interpreted ordering — log₂(bounds) compares per row, any orderable
  * type (structs included).
  */
case class RangeBucket(child: Expression, bounds: Array[Any], elemType: DataType)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!DataType.equalsStructurally(child.dataType, elemType, ignoreNullability = true))
      TypeCheckResult.TypeCheckFailure(
        s"range_bucket: value type ${child.dataType.sql} != boundary type ${elemType.sql}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(elemType))
      TypeCheckResult.TypeCheckFailure(s"range_bucket: ${elemType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "range_bucket"

  // rebuilt on each JVM after task deserialization (orderings are not
  // uniformly serializable across types)
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  // Specialized primitive boundary arrays: the search runs per ROW in the
  // hot path of every consumer, and a generic Ordering pays a boxed,
  // megamorphic compare per probe step — measurably slow at millions of
  // rows. Boundaries are strictly ascending and distinct (per-range max
  // of a unique key), so Arrays.binarySearch's exact/insertion-point
  // semantics give the lower bound directly. Double/Float use
  // Double.compare total order — identical to Spark's DoubleType ordering
  // (NaN greatest, -0.0 < 0.0). `long` also serves timestamps, `int`
  // serves dates (their internal physical forms).
  @transient private lazy val dblBounds: Array[Double] = elemType match {
    case org.apache.spark.sql.types.DoubleType => bounds.map(_.asInstanceOf[Double])
    case _ => null
  }
  @transient private lazy val fltBounds: Array[Float] = elemType match {
    case org.apache.spark.sql.types.FloatType => bounds.map(_.asInstanceOf[Float])
    case _ => null
  }
  @transient private lazy val lngBounds: Array[Long] = elemType match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      bounds.map(_.asInstanceOf[Long])
    case _ => null
  }
  @transient private lazy val intBounds: Array[Int] = elemType match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType =>
      bounds.map(_.asInstanceOf[Int])
    case _ => null
  }

  def bucketOfDouble(v: Double): Int = {
    val p = java.util.Arrays.binarySearch(dblBounds, v)
    if (p >= 0) p else -p - 1
  }
  def bucketOfFloat(v: Float): Int = {
    val p = java.util.Arrays.binarySearch(fltBounds, v)
    if (p >= 0) p else -p - 1
  }
  def bucketOfLong(v: Long): Int = {
    val p = java.util.Arrays.binarySearch(lngBounds, v)
    if (p >= 0) p else -p - 1
  }
  def bucketOfInt(v: Int): Int = {
    val p = java.util.Arrays.binarySearch(intBounds, v)
    if (p >= 0) p else -p - 1
  }

  /** Name of the specialized search for this type, or null → generic. */
  private def specializedMethod: String = elemType match {
    case org.apache.spark.sql.types.DoubleType => "bucketOfDouble"
    case org.apache.spark.sql.types.FloatType => "bucketOfFloat"
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => "bucketOfLong"
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType =>
      "bucketOfInt"
    case _ => null
  }

  /** Lower-bound binary search: count of boundary values strictly below
    * `v`. Called from both the interpreted path and generated code.
    */
  def bucketOf(v: Any): Int = {
    if (v == null) return 0
    specializedMethod match {
      case "bucketOfDouble" => return bucketOfDouble(v.asInstanceOf[Double])
      case "bucketOfFloat" => return bucketOfFloat(v.asInstanceOf[Float])
      case "bucketOfLong" => return bucketOfLong(v.asInstanceOf[Long])
      case "bucketOfInt" => return bucketOfInt(v.asInstanceOf[Int])
      case _ =>
    }
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(bounds(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: InternalRow): Any = bucketOf(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rangeBucket", this, classOf[RangeBucket].getName)
    val c = child.genCode(ctx)
    val out = ctx.freshName("bkt")
    // primitive call for primitive physical types — no boxing in the row loop
    val call = specializedMethod match {
      case null => s"$self.bucketOf(${c.value})"
      case m => s"$self.$m(${c.value})"
    }
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
        Seq(s"""
           |${c.code}
           |int $out = ${c.isNull} ? 0 : $call;
         """.stripMargin),
        Seq.empty),
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(out, IntegerType))
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

object RangeBucket {
  /** Column form: `boundsExternal` are EXTERNAL (collected Row) values of
    * `elemType`, converted here once on the driver.
    */
  def apply(value: Column, boundsExternal: Seq[Any], elemType: DataType): Column = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(elemType)
    GraftSqlBridge.column(new RangeBucket(
      GraftSqlBridge.expression(value), boundsExternal.map(conv).toArray, elemType))
  }

  /** Column form over CATALYST-INTERNAL boundary values (already copied
    * out of their source rows) — the [[graft.operators.Packing]] sketch
    * path, which samples internal rows directly.
    */
  def internal(value: Column, boundsInternal: Array[Any], elemType: DataType): Column =
    GraftSqlBridge.column(new RangeBucket(
      GraftSqlBridge.expression(value), boundsInternal, elemType))
}
