package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** The engine's custom Catalyst expressions as SQL-callable functions, so
  * `spark.sql("...")` users get the same codegen'd kernels the DataFrame
  * API exposes ([[graft.functions.VectorFunctions]]).
  *
  * Two activation paths:
  *  - per-session: `GraftFunctions.register(spark)`;
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard `SparkSessionExtensions` hook — every session created
  *    on the cluster gets the functions without code changes).
  */
object GraftFunctions {

  /** Lift a Column-composition operator into a function-registry builder:
    * wrap the caller's argument expressions as Columns, compose, unwrap.
    * The resulting SQL function IS the DataFrame operator — same codegen'd
    * built-ins underneath, one definition.
    */
  private def lift1(name: String)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name takes 1 argument, got ${children.length}")
    GraftSqlBridge.resolvableExpression(f(GraftSqlBridge.column(children.head)))
  }

  /** (name, info, builder) triples — the single source for both paths. */
  private[graft] val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.operators.TextAnalysis
    Seq(
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"vec_dot takes 2 arguments, got ${children.length}")
          DotProduct(children.head, children(1))
        }),
      (FunctionIdentifier("redact_pii"),
        new ExpressionInfo(TextAnalysis.getClass.getName, "redact_pii"),
        lift1("redact_pii")(TextAnalysis.redactPii)),
      (FunctionIdentifier("quality_score"),
        new ExpressionInfo(TextAnalysis.getClass.getName, "quality_score"),
        lift1("quality_score")(TextAnalysis.qualityScore)),
      (FunctionIdentifier("lang_id"),
        new ExpressionInfo(TextAnalysis.getClass.getName, "lang_id"),
        lift1("lang_id")(TextAnalysis.langId)),
      (FunctionIdentifier("token_count"),
        new ExpressionInfo(TextAnalysis.getClass.getName, "token_count"),
        lift1("token_count")(TextAnalysis.tokenCount)),
      (FunctionIdentifier("doc_fingerprint"),
        new ExpressionInfo(TextAnalysis.getClass.getName, "doc_fingerprint"),
        lift1("doc_fingerprint")(TextAnalysis.fingerprint)),
      (FunctionIdentifier("normalize_dedup"),
        new ExpressionInfo(TextAnalysis.getClass.getName, "normalize_dedup"),
        lift1("normalize_dedup")(TextAnalysis.normalizeForDedup)))
  }

  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      GraftSqlBridge.registerFunction(spark, ident, info, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}
