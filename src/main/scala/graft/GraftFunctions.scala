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
        lift1("normalize_dedup")(TextAnalysis.normalizeForDedup)),
      (FunctionIdentifier("vec_dot_int"),
        new ExpressionInfo(classOf[graft.functions.DotProductInt].getName,
          "vec_dot_int"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"vec_dot_int takes 2 arguments, got ${children.length}")
          graft.functions.DotProductInt(children.head, children(1))
        }),
      (FunctionIdentifier("damerau_levenshtein"),
        new ExpressionInfo(classOf[graft.functions.DamerauLevenshtein].getName,
          "damerau_levenshtein"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"damerau_levenshtein takes 2 arguments, got ${children.length}")
          graft.functions.DamerauLevenshtein(children.head, children(1))
        }),
      (FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
          "jaro_winkler"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"jaro_winkler takes 2 arguments, got ${children.length}")
          graft.functions.JaroWinkler(children.head, children(1))
        }),
      // unicode_normalize(s[, form]): form must be a string LITERAL — the
      // expression embeds the form ordinal in generated code, so it is a
      // plan-time constant by construction, not a per-row argument.
      (FunctionIdentifier("unicode_normalize"),
        new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getName,
          "unicode_normalize"),
        (children: Seq[Expression]) => {
          require(children.length == 1 || children.length == 2,
            s"unicode_normalize(str[, form]) takes 1 or 2 arguments, got ${children.length}")
          val form = children.lift(1)
            .map(litString("unicode_normalize", _, 2)).getOrElse("NFC")
          graft.functions.UnicodeNormalize(children.head, form)
        }))
  }

  // ------------------------------------------- table-valued functions
  //
  // SQL reachability for the versioned-table read modes that otherwise
  // need DataFrame options: `SELECT * FROM colf_changes('/t', 2)` is the
  // incremental-recompute primitive ("files added since version 2") and
  // `colf_snapshot('/t', 2)` a function-position alternative to the
  // catalog's VERSION AS OF. Arguments must be literals — a TVF resolves
  // at analysis time, before any row exists to evaluate against.

  private def litString(fn: String, e: Expression, pos: Int): String = {
    require(e.foldable, s"$fn: argument $pos must be a literal, got $e")
    val v = e.eval()
    require(v != null, s"$fn: argument $pos must not be null")
    v.toString
  }

  private def litLong(fn: String, e: Expression, pos: Int): Long = {
    val s = litString(fn, e, pos)
    scala.util.Try(s.toLong).getOrElse(
      throw new IllegalArgumentException(s"$fn: argument $pos must be a version number, got '$s'"))
  }

  private def colfRelation(path: String,
      extra: Map[String, String]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", path)
    extra.foreach { case (k, v) => opts.put(k, v) }
    val cis = new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts)
    val provider = new graft.sources.colf.ColfDataSource()
    GraftSqlBridge.v2Relation(
      provider.getTable(provider.inferSchema(cis), Array.empty, opts), cis)
  }

  private[graft] val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("colf_snapshot"),
      new ExpressionInfo("graft.GraftFunctions", "colf_snapshot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "colf_snapshot(path, version) takes 2 arguments")
        colfRelation(litString("colf_snapshot", children.head, 1),
          Map("versionAsOf" -> litLong("colf_snapshot", children(1), 2).toString))
      }),
    (FunctionIdentifier("colf_changes"),
      new ExpressionInfo("graft.GraftFunctions", "colf_changes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "colf_changes(path, sinceVersion) takes 2 arguments")
        colfRelation(litString("colf_changes", children.head, 1),
          Map("changesSinceVersion" -> litLong("colf_changes", children(1), 2).toString))
      }),
    // observability: per-file layout/stats and the snapshot history as
    // ordinary relations (planning-cost metadata only, no data blocks)
    (FunctionIdentifier("colf_files"),
      new ExpressionInfo("graft.GraftFunctions", "colf_files"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "colf_files(path) takes 1 argument")
        graft.sources.colf.ColfInfo.filesPlan(litString("colf_files", children.head, 1))
      }),
    (FunctionIdentifier("colf_versions"),
      new ExpressionInfo("graft.GraftFunctions", "colf_versions"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "colf_versions(path) takes 1 argument")
        graft.sources.colf.ColfInfo.versionsPlan(litString("colf_versions", children.head, 1))
      }),
    // row-level snapshot diff: rows tagged 'added'/'removed' between
    // version `from` and `to` (default latest) — CDC between snapshots
    // from pure SQL, same plan ColfMaintenance.diffVersions builds
    (FunctionIdentifier("colf_diff"),
      new ExpressionInfo("graft.GraftFunctions", "colf_diff"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          "colf_diff(path, fromVersion[, toVersion]) takes 2 or 3 arguments")
        val spark = SparkSession.active
        graft.sources.colf.ColfMaintenance.diffVersions(spark,
          litString("colf_diff", children.head, 1),
          litLong("colf_diff", children(1), 2),
          children.lift(2).map(litLong("colf_diff", _, 3)))
          .queryExecution.logical
      }))

  def register(spark: SparkSession): Unit = {
    all.foreach { case (ident, info, builder) =>
      GraftSqlBridge.registerFunction(spark, ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      GraftSqlBridge.registerTableFunction(spark, ident, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    GraftFunctions.tableFunctions.foreach { case (ident, info, builder) =>
      ext.injectTableFunction((ident, info, builder))
    }
  }
}
