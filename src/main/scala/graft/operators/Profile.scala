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

  /** Distribution-drift report between a baseline and a current slice of
    * a 2-dp metric: equal-width histogram counts side by side per bin,
    * plus the total-variation distance — the monitoring check that
    * catches a feature's distribution moving between training drops.
    *
    * Exactness (the whole point of choosing TVD over PSI/KL here): PSI
    * needs `ln`, whose last bit is not IEEE-pinned across math libraries
    * (the BM25 lesson); TVD = ½·Σ|p_base − p_cur| needs only integer
    * cross-products — the per-bin contribution is
    * |n_base·N_cur − n_cur·N_base| (exact longs), and the single double
    * division happens once at the end. Binning is integral too: values
    * go to exact cent longs (DECIMAL(14,2)·100), the bin width is a
    * ceil-division of the cent RANGE observed over the UNION of both
    * slices, so every row's bin is a pure integer function — no
    * float-boundary row can land differently in another engine.
    *
    * Plan: one union bounds aggregate (one row, broadcast), one grouped
    * count per side, a full-outer bin join, one-row totals broadcast —
    * nothing driver-side, nothing all-pairs. Output: (bin, lo_cents,
    * n_base, n_cur, tvd) — tvd repeated per row (it is a property of the
    * pair, kept on every row so the report is one flat table).
    */
  def histogramDrift(base: DataFrame, cur: DataFrame, value: org.apache.spark.sql.Column,
      nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    def cents(df: DataFrame) =
      df.select((value.cast("decimal(14,2)") * 100).cast("long").as("c"))
    val b = cents(base); val c = cents(cur)
    val bounds = b.unionByName(c).agg(min("c").as("lo"), max("c").as("hi"))
      .select(col("lo"),
        expr(s"CASE WHEN hi = lo THEN 1 ELSE ((hi - lo) + ${nBins}L) div ${nBins}L END").as("w"))
    def binned(df: DataFrame, n: String) =
      df.crossJoin(broadcast(bounds))
        .select(expr("(c - lo) div w").as("bin"), col("lo"), col("w"))
        .groupBy("bin", "lo", "w").agg(count(lit(1)).as(n))
    val joined = binned(b, "n_base").join(binned(c, "n_cur"),
        Seq("bin", "lo", "w"), "full_outer")
      .select(col("bin"), (col("lo") + col("bin") * col("w")).as("lo_cents"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val t1 = joined.agg(sum("n_base").as("tb"), sum("n_cur").as("tc"))
    val totals = joined.crossJoin(broadcast(t1))
      .agg(max("tb").as("tb"), max("tc").as("tc"),
        sum(abs(col("n_base") * col("tc") - col("n_cur") * col("tb"))).as("num"))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("lo_cents"), col("n_base"), col("n_cur"),
        (col("num").cast("double") /
          (lit(2.0) * col("tb").cast("double") * col("tc").cast("double"))).as("tvd"))
  }
}
