package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side kernel for [[UnicodeNormalize]], a static call target for
  * whole-stage codegen (generated Java references it by fully-qualified
  * name, so it must stay an object with a JVM-static forwarder).
  *
  * Two allocation-free fast paths cover the overwhelming share of corpus
  * text before the JDK normalizer is consulted:
  *  - pure-ASCII bytes are normalized under EVERY form (composition,
  *    decomposition, and compatibility mappings only touch code points
  *    ≥ U+0080), detected with one byte scan over the raw UTF8String —
  *    no String materialization at all;
  *  - non-ASCII but already-normalized text returns the INPUT UTF8String
  *    after the JDK's quick-check (`Normalizer.isNormalized`), paying the
  *    String decode but skipping the rebuild.
  * Only text that actually changes is re-encoded.
  */
object UnicodeNormalizeKernel {
  // Form.values() allocates a defensive copy per call — cache it; ordinals
  // are stable within a JVM (the expression re-derives them from the NAME
  // after serialization, never ships an ordinal across JVMs).
  private val Forms: Array[Normalizer.Form] = Normalizer.Form.values()

  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        val form = Forms(formOrdinal)
        return if (Normalizer.isNormalized(str, form)) s
        else UTF8String.fromString(Normalizer.normalize(str, form))
      }
      i += 1
    }
    s
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * Catalyst expression — Spark ships no normalization builtin, and the
  * alternative (a Scala UDF over `String => String`) breaks whole-stage
  * codegen and serializes a closure per task. This stays inside the
  * codegen span and calls a static kernel with UTF8String in/out.
  *
  * Why the engine needs it: canonically-equivalent text ("é" as U+00E9 vs
  * "e"+U+0301) hash-splits every digest-keyed operator — exact dedup,
  * decontamination, fingerprinting — so corpus pipelines normalize before
  * hashing (the reference's all-string CSV model simply never confronts
  * this; `reference/writer.py` treats values as opaque bytes).
  *
  * `form` is a case-sensitive JDK form name (`NFC`, `NFD`, `NFKC`,
  * `NFKD`), validated at construction, never at row time.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // Validated eagerly so an unknown form fails at plan time with the JDK's
  // enum message, not per-row; the ORDINAL is what codegen embeds.
  private val formOrdinal: Int = Normalizer.Form.valueOf(form).ordinal

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeKernel.normalize(input.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalizeKernel.normalize($c, $formOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object StringNormalizeFunctions {
  /** Unicode-normalize a string column to `form` (default NFC — the form
    * the web and most corpora standardize on). See [[UnicodeNormalize]].
    */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    GraftSqlBridge.column(UnicodeNormalize(GraftSqlBridge.expression(c), form))
}
