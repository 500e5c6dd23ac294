package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality health check every ingest runs
  * before training consumes a drop: per column, row count, null count,
  * and distinct cardinality, in ONE aggregation pass.
  *
  * Shape: a single `agg` with count/count(col)/count_distinct per
  * column. Spark plans multi-column distinct aggregation with one
  * EXPAND (each row replicated once per distinct-column) + partial
  * aggregation — one shuffle ∝ columns × distinct values, no per-column
  * scans. Exact distinct is the oracle-checkable baseline; at 100 TB
  * pass `approxDistinct = true`: `approx_count_distinct` (the same
  * HLL++ sketch the `q_sketches` query exercises) replaces the EXPAND
  * plan with plain partial aggregation — no row replication, fixed
  * sketch memory per column, one ordinary shuffle — at `approxRsd`
  * relative error on the distinct counts only (rows/nulls stay exact).
  *
  * Output is long-form — (column, n_rows, n_nulls, n_distinct), one row
  * per profiled column — so downstream checks ("no column over 10%
  * null", "key column fully distinct") are plain filters.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Seq.empty,
      approxDistinct: Boolean = false, approxRsd: Double = 0.05): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile: no columns to profile")
    cols.foreach { c =>
      require(df.columns.contains(c), s"profile: column '$c' not in ${df.columns.mkString(", ")}")
    }
    require(approxRsd > 0 && approxRsd < 1, s"approxRsd must be in (0,1), got $approxRsd")
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (approxDistinct) approx_count_distinct(col(c), approxRsd)
        else count_distinct(col(c))
      Seq(count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        distinctAgg.as(s"__nd_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))
    }
    row.select(explode(array(stacked: _*)).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct")
  }
}
