package graft.sources.colf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** COLF schema inference over a raw all-string table, replicating the
  * reference's rules (writer.py:33-68, SURVEY.md §1.4) as ONE distributed
  * aggregation pass — not the reference's driver-side row loop:
  *
  *  - blank/whitespace-only cell (or missing) ⇒ column nullable, cell NULL
  *    — for every type, including strings;
  *  - all non-blank cells parse as integers ⇒ int32 (an all-blank column is
  *    vacuously int32, matching the reference);
  *  - else all parse as floats (incl. "1e3", "nan", "inf") ⇒ float64;
  *  - else utf8. Strings keep interior/trailing whitespace; numerics are
  *    trimmed before parsing.
  *
  * At scale this is a single map-side-combined agg producing one row of
  * per-column booleans — no shuffle of the data itself, no driver loop.
  */
object ColfInference {

  /** Python-int grammar (writer.py:53 uses int(s) after strip). */
  private val IntRe = "^[+-]?[0-9]+$"

  /** Python-float grammar (writer.py:58): decimals, scientific notation,
    * and the special values nan/inf/infinity, case-insensitive.
    */
  private val FloatRe =
    "(?i)^[+-]?((([0-9]+(\\.[0-9]*)?)|(\\.[0-9]+))(e[+-]?[0-9]+)?|nan|inf(inity)?)$"

  private def isBlank(c: Column): Column = c.isNull || trim(c) === ""

  /** Infer (type, nullable) per column. Input must be all-string (e.g.
    * `spark.read.option("header", true).csv(path)` without inferSchema —
    * the reference's O1 scan shape).
    */
  def inferFields(raw: DataFrame): IndexedSeq[ColfField] = {
    val aggs = raw.columns.flatMap { name =>
      val c = col(name)
      val t = trim(c)
      Seq(
        max(when(isBlank(c), 1).otherwise(0)).as(s"__nul_$name"),
        min(when(isBlank(c), 1).otherwise(when(t.rlike(IntRe), 1).otherwise(0))).as(s"__int_$name"),
        min(when(isBlank(c), 1).otherwise(when(t.rlike(FloatRe), 1).otherwise(0))).as(s"__flt_$name"),
      )
    }
    // Zero-row input: aggregates return null; treat as non-nullable int32
    // columns (the reference writer refuses 0-row files — writer.py:153-154
    // — we instead keep its inference rule's vacuous-truth result).
    val row = raw.agg(aggs.head, aggs.tail: _*).collect()(0)
    raw.columns.toIndexedSeq.map { name =>
      def flag(prefix: String, default: Int): Int = {
        val v = row.get(row.fieldIndex(s"__${prefix}_$name"))
        if (v == null) default else v.asInstanceOf[Int]
      }
      val tpe =
        if (flag("int", 1) == 1) ColfType.Int32
        else if (flag("flt", 1) == 1) ColfType.Float64
        else ColfType.Utf8
      ColfField(name, tpe, nullable = flag("nul", 0) == 1)
    }
  }

  def toSparkType(t: ColfType): DataType = t match {
    case ColfType.Int32   => IntegerType
    case ColfType.Float64 => DoubleType
    case ColfType.Utf8    => StringType
  }

  /** Apply inferred types to the raw-string table with reference semantics:
    * blank ⇒ null (strings too), numerics trimmed then cast, strings kept
    * verbatim (not trimmed). Int32 overflow is validated eagerly — the
    * reference writer would crash mid-encode (writer.py:111); we fail the
    * plan with a clear message instead.
    */
  def applySchema(raw: DataFrame, fields: IndexedSeq[ColfField]): DataFrame = {
    val cols = fields.map { f =>
      val c = col(f.name)
      val casted = f.tpe match {
        case ColfType.Int32   => trim(c).cast(LongType)
        case ColfType.Float64 => trim(c).cast(DoubleType)
        case ColfType.Utf8    => c
      }
      when(isBlank(c), lit(null)).otherwise(casted).as(f.name)
    }
    val typed = raw.select(cols: _*)
    // Strict-int32 validation (one cheap filter-agg over the int columns).
    val intCols = fields.filter(_.tpe == ColfType.Int32).map(_.name)
    if (intCols.nonEmpty) {
      val overflow = intCols.map(n => max(when(col(n) < Int.MinValue || col(n) > Int.MaxValue, lit(n))).as(n))
      val bad = typed.agg(overflow.head, overflow.tail: _*).collect()(0)
        .toSeq.collect { case s: String => s }
      require(bad.isEmpty,
        s"int32 overflow in column(s) ${bad.mkString(", ")}: COLF int32 is strict " +
          "(the reference writer fails on overflow, writer.py:111); widen to float64 or clean the data")
    }
    typed.select(fields.map { f =>
      (if (f.tpe == ColfType.Int32) col(f.name).cast(IntegerType) else col(f.name)).as(f.name)
    }: _*)
  }

  /** One-call CSV → typed DataFrame with COLF semantics (the parity layer
    * for the reference's `csv_to_custom` entry point, E1).
    */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    applySchema(raw, inferFields(raw))
  }
}
