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
  * A very hot key concentrates its rows in one window partition
  * (spillable); pre-split such keys by a coarse time bucket if needed.
  *
  * Contract: right time values must be non-null; (keys, rightTime) should
  * be unique on the right side (dedupe first — otherwise which equal-time
  * right row wins is tie-ambiguous); left/right non-key column names must
  * not collide.
  */
object AsOfJoin {

  /** @param joinType "left" keeps unmatched left rows (right columns
    *                 null); "inner" drops them.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOfJoin supports inner|left, got $joinType")
    require(keys.nonEmpty, "asOfJoin needs at least one key column")

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

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lU.unionByName(rU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val kept = if (joinType == "inner") matched.where(col("__m").isNotNull) else matched
    kept.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        rightCarried.map(c => col(s"__m.$c").as(c)): _*)
  }
}
