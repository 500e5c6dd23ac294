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

  /** (name, info, builder) triples — the single source for both paths. */
  private[graft] val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"vec_dot takes 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))

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
