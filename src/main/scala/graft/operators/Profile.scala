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
  /** Join-key skew report — the pre-join diagnostic that decides whether
    * a shuffle join needs salting (and how much) BEFORE the 10-hour job
    * hits one monster partition: distinct key count, row count, max and
    * rank-based p50/p99/p999 of the per-key row counts, the heaviest
    * key's share of all rows, and a suggested salt factor
    * (ceil(max / p99), 1 when skew is benign — spread the worst key over
    * enough salts that its shards look like a p99 key).
    *
    * Determinism: every statistic is an exact integer except the share
    * (one double division at the end); percentiles are RANK-SELECTED
    * (the ceil(q·n)-th smallest count — `percentile_disc` semantics),
    * not interpolated, because interpolation arithmetic is the kind of
    * float expression engines disagree on and a skew decision never
    * needs sub-integer resolution.
    *
    * Plan: one keyed count, one window rank over the (small) per-key
    * count table, one-row output. The count table is |distinct keys|
    * rows — if THAT doesn't fit a partition, the join was never going to
    * work unsalted anyway, which is exactly what the report says.
    */
  def joinKeySkew(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(key.as("k")).groupBy("k").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt"), col("k"))
    val ranked = counts.withColumn("rn", row_number().over(w))
    def rankSel(q: Double, name: String) =
      max(when(col("rn") === ceil(lit(q) * col("n_keys")).cast("int"),
        col("cnt"))).as(name)
    ranked
      .crossJoin(broadcast(counts.agg(count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"), max("cnt").as("max_cnt"))))
      .agg(max("n_keys").as("n_keys"), max("n_rows").as("n_rows"),
        max("max_cnt").as("max_cnt"),
        rankSel(0.5, "p50"), rankSel(0.99, "p99"), rankSel(0.999, "p999"))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50"), col("p99"), col("p999"),
        (col("max_cnt").cast("double") / col("n_rows")).as("max_share"),
        expr("CASE WHEN p99 > 0 THEN CAST((max_cnt + p99 - 1) div p99 AS BIGINT) " +
          "ELSE CAST(1 AS BIGINT) END").as("suggested_salt"))
  }

  /** Per-group winsorization: clip each row's value to the group's
    * [pLow, pHigh] rank-selected bounds — the outlier-taming step before
    * means/regressions that a single fat-finger row would otherwise own.
    * Bounds use percentile_disc semantics (smallest value whose
    * cumulative row count reaches ceil(q·n)) — rank SELECTION, no
    * interpolation float math, same portability argument as
    * [[joinKeySkew]].
    *
    * Scale shape: the quantile machinery runs over the per-(group,
    * DISTINCT value) count table, not the rows — the cumulative window
    * walks |distinct values| entries per group (bounded for 2-dp metrics)
    * while the row table is touched map-only (one broadcast-joined clip).
    * Output: input id/group/value + the group bounds + `v_clipped`.
    */
  def winsorize(df: DataFrame, id: org.apache.spark.sql.Column,
      group: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
      pLow: Double = 0.01, pHigh: Double = 0.99): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pLow >= 0 && pHigh <= 1 && pLow <= pHigh,
      s"need 0 <= pLow <= pHigh <= 1, got ($pLow, $pHigh)")
    val base = df.select(id.as("row_id"), group.as("grp"), value.as("v"))
    val counts = base.groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy("grp")))
    val bounds = cum.groupBy("grp").agg(
      min(when(col("cum") >= ceil(lit(pLow) * col("n")), col("v"))).as("lo"),
      min(when(col("cum") >= ceil(lit(pHigh) * col("n")), col("v"))).as("hi"))
    base.join(broadcast(bounds), "grp")
      .select(col("row_id"), col("grp"), col("v"), col("lo"), col("hi"),
        least(greatest(col("v"), col("lo")), col("hi")).as("v_clipped"))
  }

  /** Per-group MAD (median-absolute-deviation) outlier report — the
    * ROBUST complement of [[graft.operators.Analytics.zscoreOutliers]]:
    * mean/stddev move with the very outliers they are meant to flag,
    * while the median and the MAD are 50%-breakdown estimators, so one
    * fat-finger row can never mask itself. Flags rows with
    * |v − median| > k · MAD.
    *
    * Portability (oracle-exact): both medians are percentile_disc-style
    * rank SELECTIONS over the per-(group, distinct value) count table —
    * the smallest value whose cumulative count reaches ceil(0.5·n); the
    * only arithmetic is abs(v − med) and the k·MAD compare, correctly
    * rounded IEEE with a fixed expression shape on both engines.
    *
    * Scale shape (same argument as [[winsorize]]): the quantile machinery
    * walks |distinct values| entries per group, not rows; the row table
    * is touched by two broadcast-joined map passes. A group where MORE
    * than half the rows share one value has MAD = 0 — every deviating
    * row flags, the documented (and standard) MAD behavior.
    *
    * Output: (row_id, grp, v, med, mad, dev) for flagged rows only.
    */
  def madOutliers(df: DataFrame, id: org.apache.spark.sql.Column,
      group: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
      k: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    def lowerMedian(rows: DataFrame, v: String, out: String): DataFrame = {
      val counts = rows.groupBy("grp", v).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("grp").orderBy(v)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts.withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(Window.partitionBy("grp")))
        .groupBy("grp")
        .agg(min(when(col("cum") >= ceil(lit(0.5) * col("n")), col(v))).as(out))
    }
    // Null values are EXCLUDED up front (the lmScore/bpeTokenCount
    // contract): a null can be neither a median candidate nor an outlier,
    // and leaving nulls in the count table would make the windowed
    // cumulative-median selection engine-dependent (Spark orders nulls
    // first, DuckDB last).
    val base = df.where(value.isNotNull)
      .select(id.as("row_id"), group.as("grp"), value.as("v"))
    val med = lowerMedian(base, "v", "med")
    val dev = base.join(broadcast(med), "grp")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.select(col("grp"), col("dev").as("v")), "v", "mad")
    dev.join(broadcast(mad), "grp")
      .where(col("dev") > lit(k) * col("mad"))
      .select(col("row_id"), col("grp"), col("v"), col("med"), col("mad"), col("dev"))
  }

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
