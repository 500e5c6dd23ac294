package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, the single right row
  * with the LARGEST right time ≤ the left row's time among rows sharing
  * the join keys — events joined to the dimension state that was current
  * when they happened (features to the latest checkpoint, trades to the
  * prevailing quote, documents to the crawl snapshot they came from).
  *
  * Spark has no native as-of join, and the naive formulation — a non-equi
  * range join + per-key max — executes as a broadcast-nested-loop over
  * O(|L|·|R|) pairs. This implementation is the scalable union-window
  * form instead:
  *
  *  1. union both sides into one keyed, time-ordered stream (right rows
  *     sort BEFORE left rows at equal timestamps, so "at or before" holds
  *     on ties);
  *  2. one window over (keys) ordered by (time, side) carries the most
  *     recent right payload forward (`last(_, ignoreNulls)` over rows
  *     unbounded-preceding..current);
  *  3. keep the left rows, flattening the carried payload.
  *
  * Cost shape: ONE shuffle of |L|+|R| rows on the join keys and a per-key
  * sort — the same cost class as a plain shuffle join, no pair blowup.
  *
  * Hot keys: without mitigation, all rows of one join key sort in a
  * single window partition — one device/user owning 90% of a 100-TB
  * event stream turns the query into one straggler task. Passing
  * `timeBucketWidth` pre-splits every key's window by a coarse time
  * bucket: the window partitions on (keys, bucket), and each bucket is
  * seeded with a synthetic "carry-in" row holding the latest right row
  * from all EARLIER buckets (computed by a cheap per-(key,bucket)
  * aggregate + a tiny window over bucket numbers — data volume ≤ one row
  * per key per bucket, partial-aggregated map-side). A hot key then
  * spreads over (time range / width) tasks while every left row still
  * sees its true predecessor. Pick a width coarse enough that per-bucket
  * row counts fit a task (e.g. a day of events), fine enough to split
  * the hot key's history.
  *
  * Contract: right time values must be non-null; (keys, rightTime) should
  * be unique on the right side (dedupe first — otherwise which equal-time
  * right row wins is tie-ambiguous); left/right non-key column names must
  * not collide.
  */
object AsOfJoin {

  /** @param joinType "left" keeps unmatched left rows (right columns
    *                 null); "inner" drops them.
    * @param timeBucketWidth optional hot-key pre-split: window on
    *                 (keys, floor(time/width)) instead of (keys), with
    *                 per-bucket carry-in of the latest earlier right row.
    *                 Width is in the time column's numeric scale (epoch
    *                 seconds for timestamps).
    * @param tolerance optional max staleness (same numeric scale as the
    *                 time columns): a match older than
    *                 leftTime − tolerance is treated as NO match — nulled
    *                 under "left", dropped under "inner". This is exactly
    *                 "latest right within [t − tol, t]": any right row
    *                 inside that window would itself be the as-of match,
    *                 so filtering the match is equivalent to bounding the
    *                 search — no second pass needed (pandas merge_asof
    *                 tolerance semantics, inclusive bound).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, joinType: String = "inner",
      timeBucketWidth: Option[Double] = None,
      tolerance: Option[Double] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOfJoin supports inner|left, got $joinType")
    require(keys.nonEmpty, "asOfJoin needs at least one key column")
    require(timeBucketWidth.forall(_ > 0),
      s"timeBucketWidth must be positive, got $timeBucketWidth")
    require(tolerance.forall(_ >= 0),
      s"tolerance must be non-negative, got $tolerance")

    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rightCarried = rightTime +: rightPayload

    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightCarried.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lU = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)
    val unioned = lU.unionByName(rU)

    val matched = timeBucketWidth match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

      case Some(width) =>
        val tType = unioned.schema("__t").dataType
        val bucketed = unioned.withColumn("__b",
          floor(col("__t").cast("double") / width).cast("long"))
        val keyB = keys :+ "__b"

        // Latest right row inside each (key, bucket): a partial-aggregated
        // groupBy — output is ≤ one row per key per bucket regardless of
        // how hot the key is, so the carry computation never concentrates.
        val lastInBucket = bucketed.where(col("__r").isNotNull)
          .groupBy(keyB.map(col): _*)
          .agg(max_by(col("__r"), col("__t")).as("__lastr"))

        // Carry-in for bucket b = latest right row over all buckets < b,
        // for EVERY bucket either side populates (a left-only bucket still
        // needs its predecessor's state). The window runs over bucket
        // NUMBERS (tiny), not rows.
        val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = bucketed.select(keyB.map(col): _*).distinct()
          .join(lastInBucket, keyB, "left")
          .withColumn("__carry", last(col("__lastr"), ignoreNulls = true).over(wCarry))
          .where(col("__carry").isNotNull)

        // Seed each bucket with its carry-in as a synthetic row sorting
        // before every real in-bucket row: t = bucket start (≤ all
        // in-bucket times), side = -1 (before right rows on ties).
        val synth = carry.select(
          keys.map(col) ++ Seq(
            (col("__b").cast("double") * width).cast(tType).as("__t"),
            lit(-1).as("__side"),
            lit(null).cast(lType).as("__l"), col("__carry").as("__r"),
            col("__b")): _*)

        val w = Window.partitionBy(keyB.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.unionByName(synth)
          .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    }

    // Tolerance: null the match when it is older than leftTime − tol.
    // Applied to __m BEFORE the inner-join filter so both join types see
    // the same no-match semantics. The double cast matches the
    // timeBucketWidth scale convention (epoch seconds for timestamps).
    val bounded = tolerance match {
      case None => matched
      case Some(tol) => matched.withColumn("__m",
        when(col("__m").isNotNull &&
          col("__t").cast("double") - col(s"__m.$rightTime").cast("double") <= tol,
          col("__m")))
    }

    val leftOnly = bounded.where(col("__side") === 1)
    val kept = if (joinType == "inner") leftOnly.where(col("__m").isNotNull) else leftOnly
    kept.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        rightCarried.map(c => col(s"__m.$c").as(c)): _*)
  }
}
