package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations (the Deequ/Great-Expectations idiom): declare
  * row-level predicates and key-uniqueness constraints, get back one
  * violation-count report row per check. The gate a production ingest
  * runs BEFORE publishing a snapshot — the engine-side generalization of
  * the harness's own testdata contract preflight.
  *
  * Scale design: ALL row-level checks evaluate in ONE scan (a single
  * aggregate computes every (rows, violations) pair, then unpivots via an
  * inline array — adding a check adds a column to one agg, not a pass
  * over 100 TB). Each uniqueness check is one keyed count — the shuffle
  * that constraint fundamentally needs.
  *
  * Null semantics (documented, mirrored by the oracle): a row where the
  * predicate evaluates to NULL is NOT a violation of that check — pair a
  * not-null expectation with value checks, don't overload them.
  */
object Expectations {

  /** Report columns: (check_name, n_rows, n_violations, pass). */
  def check(df: DataFrame,
            rowChecks: Seq[(String, Column)],
            uniqueKeys: Seq[(String, Seq[Column])] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKeys.nonEmpty, "no checks declared")
    val parts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (rowChecks.nonEmpty) {
      val aggs = count(lit(1)).as("__n") +: rowChecks.map { case (name, p) =>
        sum(when(!p, 1L).otherwise(0L)).as(s"__v_$name")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val entries = rowChecks.map { case (name, _) =>
        struct(lit(name).as("check_name"), col("__n").as("n_rows"),
          col(s"__v_$name").as("n_violations"))
      }
      parts += one.select(explode(array(entries: _*)).as("e"))
        .select(col("e.check_name"), col("e.n_rows"), col("e.n_violations"))
    }
    uniqueKeys.foreach { case (name, keys) =>
      parts += df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          (sum(col("c")) - count(lit(1))).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
    }
    parts.reduce(_.union(_))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Referential-integrity report: for each declared foreign-key
    * relationship, how many child rows point at a parent key that does
    * not exist — the orphan count a lakehouse without enforced
    * constraints must measure instead of assume. One row per
    * relationship: (relation, n_child_rows, n_orphans, pass).
    *
    * Plan per relationship: a LEFT ANTI join of the child's key column
    * against the parent's DISTINCT keys, counted — the minimal shuffle
    * the question needs; the parent side collapses to its key set first
    * (partial-aggregated), so the join carries |distinct parent keys|,
    * not the parent table.
    */
  def fkOrphans(relations: Seq[(String, DataFrame, Column, DataFrame, Column)]): DataFrame = {
    require(relations.nonEmpty, "no FK relationships declared")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val total = child.agg(count(lit(1)).as("n_child_rows"))
      val orphans = child.select(childKey.as("__fk"))
        .join(parent.select(parentKey.as("__fk")).distinct(), Seq("__fk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      total.crossJoin(orphans)
        .select(lit(name).as("relation"), col("n_child_rows"), col("n_orphans"),
          (col("n_orphans") === 0L).as("pass"))
    }.reduce(_.union(_))
  }

  /** k-anonymity report over a quasi-identifier set: every combination of
    * quasi-id values carried by FEWER than k rows, with its count — the
    * re-identification surface a release gate must clear (a combo seen
    * once pins a row to one individual even with direct identifiers
    * redacted; pairs with `TextAnalysis`' PII redaction, which handles
    * the direct identifiers).
    *
    * Plan: one keyed count over the quasi-id tuple + a filter — the
    * minimal shuffle the constraint needs; the report is at most
    * |violating combos| rows, which a passing release makes empty.
    */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiIds: _*).agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** l-diversity violations: quasi-identifier combos whose rows carry
    * fewer than `l` DISTINCT values of the sensitive attribute. The
    * attack k-anonymity misses — a group can be large (k-anonymous) yet
    * homogeneous, so membership alone discloses the sensitive value
    * (Machanavajjhala et al., ICDE '06). Reports (quasi-ids..., n,
    * n_distinct) for each violating combo.
    *
    * Plan: one exact count-distinct aggregate over the quasi-id tuple +
    * a filter. Exact (not approx_count_distinct): l is small and the
    * report gates a privacy release — a sketch under-count would mint
    * false violations and an over-count would HIDE real ones.
    */
  def lDiversityViolations(df: DataFrame, quasiIds: Seq[Column],
                           sensitive: Column, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"), countDistinct(sensitive).as("n_distinct"))
      .where(col("n_distinct") < l)
  }
}
